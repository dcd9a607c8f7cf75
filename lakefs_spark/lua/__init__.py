"""Embedded Lua for ``type: lua`` hooks — a pure-Python interpreter.

The reference embeds a Lua 5.3 VM for hook scripts
(pkg/actions/lua.go:38-171) plus a curated stdlib (pkg/actions/lua/:
strings, path, regexp, encoding/json, encoding/yaml, net/url, and the
``lakefs`` client shim). This package is an original pure-Python
implementation of the language subset those hook scripts use —
closures, multiple returns, metatables, generic/numeric for, string
methods, Lua patterns — plus Python ports of the same host modules, so
an unmodified ``_lakefs_actions/`` spec declaring ``type: lua`` runs
here against the engine's own Repository.

Out-of-scope stdlib (io, os.execute, coroutines, goto) raises
``LuaError`` — actions.py records those as explicit ``unsupported``
task rows, never a silent pass (pre-* events still abort).
"""

from lakefs_spark.lua.interp import LuaError, LuaTable, lua_tostring, run_lua
from lakefs_spark.lua.modules import make_hook_env

__all__ = ["LuaError", "LuaTable", "lua_tostring", "run_lua", "make_hook_env"]
