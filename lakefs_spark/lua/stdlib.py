"""Lua standard library subset: basic, string (with Lua patterns),
table, math — the surface the reference's hook scripts use
(pkg/actions/lua.go:38-75 opens the equivalent Go-side libraries).

Lua patterns are translated to Python regexes for the documented
subset: classes %a %c %d %l %p %s %u %w %x (and uppercase complements),
sets ``[...]``/``[^...]``, quantifiers ``* + - ?`` (``-`` is lazy),
anchors ``^ $``, captures ``(...)``, escaped magic chars ``%( %.`` etc.
``%b``/``%f`` and position captures raise LuaError (unsupported).
"""

from __future__ import annotations

import math
import re as _re

from lakefs_spark.lua.interp import (
    LuaError,
    LuaUnsupportedFeature,
    LuaTable,
    call_value,
    lua_tostring,
    lua_truthy,
    lua_type,
    normalize_key,
    tonumber,
)

# ---------------------------------------------------------------------------
# Lua patterns -> Python re
# ---------------------------------------------------------------------------

_CLASS = {
    "a": "[a-zA-Z]", "A": "[^a-zA-Z]",
    "c": r"[\x00-\x1f]", "C": r"[^\x00-\x1f]",
    "d": "[0-9]", "D": "[^0-9]",
    "l": "[a-z]", "L": "[^a-z]",
    "p": r"[!-/:-@\[-`{-~]", "P": r"[^!-/:-@\[-`{-~]",
    "s": r"[ \t\n\r\f\v]", "S": r"[^ \t\n\r\f\v]",
    "u": "[A-Z]", "U": "[^A-Z]",
    "w": "[a-zA-Z0-9]", "W": "[^a-zA-Z0-9]",
    "x": "[0-9a-fA-F]", "X": "[^0-9a-fA-F]",
}

_CLASS_INSET = {  # inside [...] — as char ranges, no brackets
    "a": "a-zA-Z", "d": "0-9", "l": "a-z", "u": "A-Z",
    "s": r" \t\n\r\f\v", "w": "a-zA-Z0-9", "x": "0-9a-fA-F",
    "p": r"!-/:-@\[-`{-~", "c": r"\x00-\x1f",
}


def lua_pattern_to_re(pat: str) -> str:
    out = []
    depth = 0  # open captures; unbalanced = error, like lstrlib
    # per-capture closed flag in OPEN order (lstrlib capture array):
    # %N is valid iff capture N exists AND is already closed — a scalar
    # closed-count misjudges nesting both ways (((a)%1) vs ((a)%2))
    cap_closed: list[bool] = []
    open_stack: list[int] = []
    quantifiable = False  # Lua: * + - ? modify only a preceding single
    # character class; anywhere else they match literally (lstrlib.c
    # match_default treats them as ordinary items)
    i, n = 0, len(pat)
    if pat.startswith("^"):
        out.append("^")
        i = 1
    while i < n:
        c = pat[i]
        if c == "%":
            i += 1
            if i >= n:
                raise LuaError("malformed pattern (ends with '%')")
            e = pat[i]
            if e in _CLASS:
                out.append(_CLASS[e])
            elif e.isdigit():
                # back-reference: must name an existing, already-CLOSED
                # capture (lstrlib check_capture); referencing an OPEN
                # capture is the 'unfinished capture' error
                ncap = int(e)
                if ncap == 0 or ncap > len(cap_closed) or not cap_closed[ncap - 1]:
                    raise LuaError(f"invalid capture index %{e}")
                out.append("\\" + e)
                quantifiable = False
                i += 1
                continue
            elif e in ("b", "f"):
                raise LuaUnsupportedFeature(f"pattern item %%{e} is not supported")
            else:
                out.append(_re.escape(e))
            quantifiable = True
            i += 1
            continue
        if c == "[":
            j = i + 1
            neg = False
            if j < n and pat[j] == "^":
                neg = True
                j += 1
            if j < n and pat[j] == "]":  # first ] is literal
                j += 1
            while j < n and pat[j] != "]":
                if pat[j] == "%":
                    j += 1
                j += 1
            if j >= n:
                raise LuaError("malformed pattern (missing ']')")
            inner = pat[i + 1 + (1 if neg else 0) : j]
            buf = []
            k = 0

            def _set_char(k):
                """One literal set member at k → (char | None, next_k).
                None = a %class escape (can't be a range endpoint)."""
                ch = inner[k]
                if ch == "%" and k + 1 < len(inner):
                    e = inner[k + 1]
                    if e.lower() in _CLASS_INSET:
                        return None, k + 2
                    return e, k + 2
                return ch, k + 1

            while k < len(inner):
                ch = inner[k]
                if ch == "%" and k + 1 < len(inner) and inner[k + 1].lower() in _CLASS_INSET:
                    e = inner[k + 1]
                    if e.islower():
                        buf.append(_CLASS_INSET[e])
                    else:
                        raise LuaUnsupportedFeature(
                            f"complement class %%{e} inside a set is not supported"
                        )
                    k += 2
                    continue
                lo, k2 = _set_char(k)
                # explicit range lo-hi (lstrlib matchclass: raw byte
                # compare; an INVERTED range like [0-/] silently matches
                # nothing — python re errors on it, so emit nothing)
                if (
                    lo is not None
                    and k2 < len(inner)
                    and inner[k2] == "-"
                    and k2 + 1 < len(inner)
                ):
                    hi, k3 = _set_char(k2 + 1)
                    if hi is not None:
                        if ord(hi) >= ord(lo):
                            buf.append(
                                _re.escape(lo) + "-" + _re.escape(hi)
                            )
                        k = k3
                        continue
                buf.append(_re.escape(lo))
                k = k2
            body = "".join(buf)
            if not body:
                # a set whose every member was an inverted range (e.g.
                # "[0-/]"): python rejects empty [] / [^], so emit the
                # classic never-match / always-match classes
                out.append(r"[\s\S]" if neg else r"[^\s\S]")
            else:
                out.append("[" + ("^" if neg else "") + body + "]")
            quantifiable = True
            i = j + 1
            continue
        if c == ".":
            out.append(".")
            quantifiable = True
            i += 1
            continue
        if c in "*+-?":
            if quantifiable:
                out.append({"*": "*", "+": "+", "-": "*?", "?": "?"}[c])
                quantifiable = False
            else:  # literal (e.g. '-' after ')' or at pattern start)
                out.append(_re.escape(c))
                quantifiable = True
            i += 1
            continue
        if c == "$" and i == n - 1:
            out.append("$")
            i += 1
            continue
        if c == "(":
            if i + 1 < n and pat[i + 1] == ")":
                raise LuaUnsupportedFeature("position captures are not supported")
            depth += 1
            cap_closed.append(False)
            open_stack.append(len(cap_closed) - 1)
            out.append("(")
            quantifiable = False
            i += 1
            continue
        if c == ")":
            if depth == 0:  # lstrlib: "invalid pattern capture"
                raise LuaError("invalid pattern capture")
            depth -= 1
            cap_closed[open_stack.pop()] = True
            out.append(")")
            quantifiable = False
            i += 1
            continue
        out.append(_re.escape(c))
        quantifiable = True
        i += 1
    if depth != 0:  # lstrlib: "unfinished capture"
        raise LuaError("malformed pattern (unfinished capture)")
    return "".join(out)


def _compile_lua_pattern(pat: str):
    return _re.compile(lua_pattern_to_re(pat), _re.DOTALL)


def _match_values(m: _re.Match):
    if m.re.groups == 0:
        return [m.group(0)]
    return [g if g is not None else None for g in m.groups()]


# ---------------------------------------------------------------------------
# string library
# ---------------------------------------------------------------------------


def _str_arg(v, fname):
    if isinstance(v, str):
        return v
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return lua_tostring(v)
    raise LuaError(f"bad argument to '{fname}' (string expected, got {lua_type(v)})")


def _abs_index(i, length, default):
    if i is None:
        i = default
    i = int(i)
    if i < 0:
        i = max(length + i + 1, 1)
    elif i == 0:
        i = 1
    return i


def s_len(s):
    return len(_str_arg(s, "len"))


def s_sub(s, i=1, j=-1):
    s = _str_arg(s, "sub")
    n = len(s)
    i = _abs_index(i, n, 1)
    j = int(j) if j is not None else -1
    if j < 0:
        j = n + j + 1
    j = min(j, n)
    if i > j:
        return ""
    return s[i - 1 : j]


def s_upper(s):
    return _str_arg(s, "upper").upper()


def s_lower(s):
    return _str_arg(s, "lower").lower()


def s_rep(s, n, sep=None):
    s = _str_arg(s, "rep")
    n = int(n)
    if n <= 0:
        return ""
    if sep:
        return (s + sep) * (n - 1) + s
    return s * n


def s_reverse(s):
    return _str_arg(s, "reverse")[::-1]


def s_byte(s, i=1, j=None):
    s = _str_arg(s, "byte")
    i = int(i)
    j = int(j) if j is not None else i
    if i < 0:
        i = len(s) + i + 1
    if j < 0:
        j = len(s) + j + 1
    return tuple(ord(c) for c in s[i - 1 : j])


def s_char(*codes):
    return "".join(chr(int(c)) for c in codes)


def s_format(fmt, *args):
    fmt = _str_arg(fmt, "format")
    out = []
    ai = 0
    i, n = 0, len(fmt)
    while i < n:
        c = fmt[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        j = i + 1
        while j < n and fmt[j] in "-+ #0123456789.":
            j += 1
        if j >= n:
            raise LuaError("invalid format string to 'format'")
        conv = fmt[j]
        spec = fmt[i : j + 1]
        if conv == "%":
            out.append("%")
            i = j + 1
            continue
        if ai >= len(args):
            raise LuaError(f"bad argument #{ai + 2} to 'format' (no value)")
        arg = args[ai]
        ai += 1
        if conv in "di":
            num = tonumber(arg)
            if num is None:
                raise LuaError(f"bad argument #{ai + 1} to 'format' (number expected)")
            out.append((spec[:-1] + "d") % int(num))
        elif conv == "u":
            out.append((spec[:-1] + "d") % int(tonumber(arg)))
        elif conv in "fFgGeE":
            out.append(spec % float(tonumber(arg)))
        elif conv in "xX":
            out.append(spec % int(tonumber(arg)))
        elif conv == "c":
            out.append(chr(int(tonumber(arg))))
        elif conv == "s":
            out.append(spec % lua_tostring(arg))
        elif conv == "q":
            s = lua_tostring(arg)
            out.append('"' + s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n") + '"')
        else:
            raise LuaError(f"invalid conversion '%{conv}' to 'format'")
        i = j + 1
    return "".join(out)


def s_find(s, pat, init=1, plain=None):
    s = _str_arg(s, "find")
    pat = _str_arg(pat, "find")
    start = _abs_index(init, len(s), 1) - 1
    if start > len(s):
        return None
    if lua_truthy(plain):
        idx = s.find(pat, start)
        if idx < 0:
            return None
        return (idx + 1, idx + len(pat))
    m = _compile_lua_pattern(pat).search(s, start)
    if m is None:
        return None
    caps = [] if m.re.groups == 0 else list(m.groups())
    return tuple([m.start() + 1, m.end()] + caps)


def s_match(s, pat, init=1):
    s = _str_arg(s, "match")
    start = _abs_index(init, len(s), 1) - 1
    m = _compile_lua_pattern(_str_arg(pat, "match")).search(s, start)
    if m is None:
        return None
    return tuple(_match_values(m))


def _lua_scan(rx, s):
    """Matches in lstrlib's iteration order: after an EMPTY match at
    position p the next attempt starts at p+1 — a longer match at p is
    never retried. Python's finditer differs (since 3.7 it retries a
    non-empty match at the same position after a zero-width one), which
    would double-count in gmatch/gsub: lua `("a"):gsub("a-", "%0")` is
    ("a", 2), finditer-based iteration gave ("aa", 3). Found by the
    hypothesis cross-surface fuzz (tests/test_lua_patterns_fuzz.py)."""
    pos, n = 0, len(s)
    while pos <= n:
        m = rx.search(s, pos)
        if m is None:
            return
        yield m
        pos = m.end() if m.end() > m.start() else m.start() + 1


def s_gmatch(s, pat):
    s = _str_arg(s, "gmatch")
    rx = _compile_lua_pattern(_str_arg(pat, "gmatch"))
    it = _lua_scan(rx, s)

    def step(*_):
        for m in it:
            return tuple(_match_values(m))
        return None

    return step


def s_gsub(s, pat, repl, max_n=None):
    s = _str_arg(s, "gsub")
    rx = _compile_lua_pattern(_str_arg(pat, "gsub"))
    limit = int(max_n) if max_n is not None else -1
    count = 0
    out = []
    pos = 0
    for m in _lua_scan(rx, s):
        if limit >= 0 and count >= limit:
            break
        out.append(s[pos : m.start()])
        vals = _match_values(m)
        if isinstance(repl, str):
            rep_s = []
            k = 0
            while k < len(repl):
                ch = repl[k]
                if ch == "%" and k + 1 < len(repl):
                    d = repl[k + 1]
                    if d == "0":
                        rep_s.append(m.group(0))
                    elif d.isdigit():
                        gi = int(d)
                        rep_s.append(m.group(gi) if m.re.groups else m.group(0))
                    else:
                        rep_s.append(d)
                    k += 2
                else:
                    rep_s.append(ch)
                    k += 1
            out.append("".join(rep_s))
        elif isinstance(repl, LuaTable):
            v = repl.get(vals[0])
            out.append(lua_tostring(v) if lua_truthy(v) else m.group(0))
        elif callable(repl):
            rv = call_value(repl, vals)
            v = rv[0] if rv else None
            out.append(lua_tostring(v) if lua_truthy(v) else m.group(0))
        else:
            raise LuaError("bad argument #3 to 'gsub'")
        pos = m.end()
        count += 1
        if m.start() == m.end():  # empty match: advance to avoid loop
            if pos < len(s):
                out.append(s[pos])
            pos += 1
    out.append(s[pos:])
    return ("".join(out), count)


STRING_LIB_PY = {
    "len": s_len, "sub": s_sub, "upper": s_upper, "lower": s_lower,
    "rep": s_rep, "reverse": s_reverse, "byte": s_byte, "char": s_char,
    "format": s_format, "find": s_find, "match": s_match,
    "gmatch": s_gmatch, "gsub": s_gsub,
}
STRING_LIB = LuaTable(STRING_LIB_PY)


# ---------------------------------------------------------------------------
# table library
# ---------------------------------------------------------------------------


def t_insert(t, a, b=None):
    if not isinstance(t, LuaTable):
        raise LuaError("bad argument #1 to 'insert' (table expected)")
    if b is None:
        t.set(t.length() + 1, a)
        return
    pos, v = int(a), b
    n = t.length()
    for i in range(n, pos - 1, -1):
        t.set(i + 1, t.get(i))
    t.set(pos, v)


def t_remove(t, pos=None):
    if not isinstance(t, LuaTable):
        raise LuaError("bad argument #1 to 'remove' (table expected)")
    n = t.length()
    if n == 0 and pos is None:
        return None
    pos = int(pos) if pos is not None else n
    v = t.get(pos)
    for i in range(pos, n):
        t.set(i, t.get(i + 1))
    t.set(n, None)
    return v


def t_concat(t, sep="", i=1, j=None):
    if not isinstance(t, LuaTable):
        raise LuaError("bad argument #1 to 'concat' (table expected)")
    sep = sep if isinstance(sep, str) else lua_tostring(sep)
    i = int(i)
    j = int(j) if j is not None else t.length()
    parts = []
    for k in range(i, j + 1):
        v = t.get(k)
        if not isinstance(v, (str, int, float)) or isinstance(v, bool):
            raise LuaError(f"invalid value (at index {k}) in table for 'concat'")
        parts.append(lua_tostring(v))
    return sep.join(parts)


def t_sort(t, comp=None):
    if not isinstance(t, LuaTable):
        raise LuaError("bad argument #1 to 'sort' (table expected)")
    n = t.length()
    items = [t.get(i) for i in range(1, n + 1)]
    if comp is None:
        items.sort()
    else:
        import functools

        def cmp(a, b):
            out = call_value(comp, [a, b])
            if lua_truthy(out[0] if out else None):
                return -1
            out2 = call_value(comp, [b, a])
            return 1 if lua_truthy(out2[0] if out2 else None) else 0

        items.sort(key=functools.cmp_to_key(cmp))
    for i, v in enumerate(items, start=1):
        t.set(i, v)


def t_unpack(t, i=1, j=None):
    if not isinstance(t, LuaTable):
        raise LuaError("bad argument #1 to 'unpack' (table expected)")
    i = int(i)
    j = int(j) if j is not None else t.length()
    return tuple(t.get(k) for k in range(i, j + 1))


TABLE_LIB = LuaTable(
    {"insert": t_insert, "remove": t_remove, "concat": t_concat,
     "sort": t_sort, "unpack": t_unpack}
)


# ---------------------------------------------------------------------------
# math library (deterministic: no random — hooks must be replayable)
# ---------------------------------------------------------------------------


def _m1(fn):
    return lambda x, *a: fn(tonumber(x), *a)


MATH_LIB = LuaTable(
    {
        "floor": lambda x: int(math.floor(tonumber(x))),
        "ceil": lambda x: int(math.ceil(tonumber(x))),
        "abs": _m1(abs),
        "max": lambda *a: max(tonumber(x) for x in a),
        "min": lambda *a: min(tonumber(x) for x in a),
        "sqrt": _m1(math.sqrt),
        "exp": _m1(math.exp),
        "log": lambda x, b=None: math.log(tonumber(x), tonumber(b)) if b else math.log(tonumber(x)),
        "pow": lambda x, y: float(tonumber(x)) ** float(tonumber(y)),
        "fmod": lambda x, y: math.fmod(tonumber(x), tonumber(y)),
        "modf": lambda x: (float(int(tonumber(x))), tonumber(x) - int(tonumber(x))),
        "tointeger": lambda x: int(tonumber(x)) if tonumber(x) is not None and float(tonumber(x)).is_integer() else None,
        "huge": math.inf,
        "pi": math.pi,
        "maxinteger": 2**63 - 1,
        "mininteger": -(2**63),
    }
)


# ---------------------------------------------------------------------------
# basic library
# ---------------------------------------------------------------------------


def lua_next(t, key=None):
    if not isinstance(t, LuaTable):
        raise LuaError("bad argument #1 to 'next' (table expected)")
    # O(1) per step via a cached (keys, key->pos) snapshot — the naive
    # per-step list() + .index() made pairs() O(n^2) on big tables. The
    # snapshot invalidates when the key SET changes (LuaTable.set), the
    # same restriction Lua itself places on next() during traversal.
    # The snapshot rebuilds ONLY when it is absent (first use, or
    # invalidated by key-set GROWTH in LuaTable.set). A fresh
    # traversal must NOT rebuild: a nested inner pairs() over the same
    # table would otherwise clobber the outer traversal's snapshot and
    # break the legal delete-current-field-then-continue pattern
    # (outer cursor key would vanish from the rebuilt position map).
    # Stale deleted keys linger in the snapshot and are skipped at
    # emission — correct, just a little memory until the next growth.
    if t._iter_cache is None:
        keys = list(t.hash.keys())
        t._iter_cache = (keys, {k: i for i, k in enumerate(keys)})
    keys, pos = t._iter_cache

    def emit_from(i: int):
        # skip keys deleted mid-traversal (legal in Lua)
        while i < len(keys):
            k = keys[i]
            if k in t.hash:
                return (k, t.hash[k])
            i += 1
        return None

    if key is None:
        return emit_from(0)
    key = normalize_key(key)
    idx = pos.get(key)
    if idx is None:
        raise LuaError("invalid key to 'next'")
    return emit_from(idx + 1)


def lua_pairs(t):
    if isinstance(t, LuaTable) and t.metatable is not None:
        mm = t.metatable.get("__pairs")
        if mm is not None:
            out = call_value(mm, [t])
            out += [None] * (3 - len(out))
            return tuple(out[:3])
    return (lua_next, t, None)


def lua_ipairs(t):
    def it(tbl, i):
        i = int(i) + 1
        v = tbl.get(i) if isinstance(tbl, LuaTable) else None
        if v is None:
            return None
        return (i, v)

    return (it, t, 0)


def lua_error(msg, level=1):
    raise LuaError(msg, int(level) if level is not None else 1)


def lua_assert(v, msg=None, *rest):
    if not lua_truthy(v):
        raise LuaError(msg if msg is not None else "assertion failed!")
    return (v, msg, *rest) if msg is not None else v


def lua_select(n, *args):
    if n == "#":
        return len(args)
    n = int(n)
    if n < 0:
        n = len(args) + n + 1
    return tuple(args[n - 1 :])


def lua_pcall(fn, *args):
    try:
        out = call_value(fn, list(args))
        return tuple([True] + out)
    except LuaError as e:
        return (False, e.value)
    except Exception as e:  # noqa: BLE001 — pcall catches everything
        return (False, f"{type(e).__name__}: {e}")


def lua_rawget(t, k):
    if not isinstance(t, LuaTable):
        raise LuaError("table expected")
    return t.get(k)


def lua_rawset(t, k, v):
    if not isinstance(t, LuaTable):
        raise LuaError("table expected")
    t.set(k, v)
    return t


def lua_rawequal(a, b):
    return a is b or (
        not isinstance(a, (LuaTable,)) and not isinstance(b, (LuaTable,)) and a == b
    )


def lua_rawlen(v):
    if isinstance(v, str):
        return len(v)
    if isinstance(v, LuaTable):
        return v.length()
    raise LuaError("table or string expected")


def lua_setmetatable(t, mt):
    if not isinstance(t, LuaTable):
        raise LuaError("bad argument #1 to 'setmetatable' (table expected)")
    if mt is not None and not isinstance(mt, LuaTable):
        raise LuaError("bad argument #2 to 'setmetatable' (nil or table expected)")
    t.metatable = mt
    return t


def lua_getmetatable(t):
    if isinstance(t, LuaTable) and t.metatable is not None:
        protected = t.metatable.get("__metatable")
        return protected if protected is not None else t.metatable
    return None


def make_base_env(output_sink=None) -> LuaTable:
    """Globals table with the base library. ``output_sink(line)``
    receives print() output (the reference captures hook output the
    same way — pkg/actions/lua.go writes to the run's output buffer)."""
    g = LuaTable()

    def lua_print(*args):
        line = "\t".join(lua_tostring(a) for a in args)
        if output_sink is not None:
            output_sink(line)

    def lua_unsupported(name):
        def _f(*_a, **_k):
            raise LuaUnsupportedFeature(f"'{name}' is not available in this sandbox")

        return _f

    def unsupported_lib(name):
        """A library stub whose ANY access raises LuaUnsupportedFeature
        — so io.write / os.time / coroutine.create classify as the
        explicit 'unsupported' task row, never as a generic
        attempt-to-index-nil failure."""

        def deny(*args):
            # varargs: __index gets (t, key), __newindex (t, key, v),
            # __call (t, ...) — any arity must classify as unsupported,
            # never leak a Python TypeError past the dispatcher
            key = args[1] if len(args) > 1 else "?"
            raise LuaUnsupportedFeature(
                f"'{name}.{lua_tostring(key)}' is not available in this sandbox"
            )

        t = LuaTable()
        t.metatable = LuaTable({"__index": deny, "__newindex": deny, "__call": deny})
        return t

    base = {
        "print": lua_print,
        "error": lua_error,
        "assert": lua_assert,
        "pairs": lua_pairs,
        "ipairs": lua_ipairs,
        "next": lua_next,
        "type": lua_type,
        "tostring": lua_tostring,
        "tonumber": tonumber,
        "select": lua_select,
        "pcall": lua_pcall,
        "rawget": lua_rawget,
        "rawset": lua_rawset,
        "rawequal": lua_rawequal,
        "rawlen": lua_rawlen,
        "setmetatable": lua_setmetatable,
        "getmetatable": lua_getmetatable,
        "unpack": t_unpack,
        "string": STRING_LIB,
        "table": TABLE_LIB,
        "math": MATH_LIB,
        # explicit denials — never silently absent
        "load": lua_unsupported("load"),
        "loadstring": lua_unsupported("loadstring"),
        "dofile": lua_unsupported("dofile"),
        "io": unsupported_lib("io"),
        "os": unsupported_lib("os"),
        "coroutine": unsupported_lib("coroutine"),
        "debug": unsupported_lib("debug"),
        "collectgarbage": lambda *_a: 0,
    }
    for k, v in base.items():
        g.set(k, v)
    g.set("_G", g)
    return g
