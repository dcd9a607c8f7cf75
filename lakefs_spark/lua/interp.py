"""A small tree-walking Lua interpreter (lexer + parser + evaluator).

Original implementation of the Lua 5.3 subset the reference's hook
scripts use (surveyed across pkg/actions/lua/lakefs/catalogexport/*.lua
and examples/hooks/*.lua):

- values: nil, boolean, integer/float, string, table, function
- statements: local/global assignment (multi-target), if/elseif/else,
  while, repeat/until, numeric for, generic for, function declarations
  (incl. ``local function`` and method sugar), do blocks, break, return
- expressions: full operator set with Lua precedence (.. right-assoc,
  ^ right-assoc above unary), and/or short-circuit, # length,
  table constructors, varargs, method calls ``a:b()``, string-literal
  and table-constructor call sugar ``f"x"`` / ``f{...}``
- multiple return values with Lua's truncation/expansion rules
- closures with mutable upvalues; metatables (__index as table or
  function, __newindex, __call, __tostring, __len, __eq/__lt/__le)
- string values respond to method calls via the string library
  (``s:sub(1,6)``) like Lua's string metatable

NOT implemented (raises LuaError at parse or run time — actions.py
surfaces these as explicit ``unsupported`` task rows): coroutines,
goto/labels, io/os process surface, load/loadstring.
"""

from __future__ import annotations

import math


class LuaError(Exception):
    """error() raised from Lua, or a runtime fault. ``value`` is the
    Lua error value (usually a string)."""

    def __init__(self, value, level: int = 1, traceback_hint: str | None = None):
        self.value = value
        self.hint = traceback_hint
        super().__init__(lua_tostring(value) if not isinstance(value, str) else value)


class LuaUnsupportedFeature(LuaError):
    """A language/stdlib surface this interpreter deliberately lacks
    (goto, coroutines, io/os, %b patterns, unknown modules). actions.py
    records these as explicit ``unsupported`` task rows, distinct from
    ordinary script failures."""


class LuaTable:
    __slots__ = ("hash", "metatable", "_iter_cache")

    def __init__(self, items=None):
        self.hash: dict = {}
        self.metatable: LuaTable | None = None
        #: (keys-snapshot, {key: position}) for O(1) next() — Lua
        #: forbids adding NEW keys during traversal, so the snapshot is
        #: valid until the key SET changes (set() invalidates below;
        #: value updates of existing keys keep it)
        self._iter_cache: tuple | None = None
        if items:
            for k, v in items.items():
                if v is not None:
                    self.hash[normalize_key(k)] = v

    # raw ops
    def get(self, key):
        return self.hash.get(normalize_key(key))

    def set(self, key, value):
        key = normalize_key(key)
        if key is None:
            raise LuaError("table index is nil")
        if isinstance(key, float) and math.isnan(key):
            raise LuaError("table index is NaN")
        if value is None:
            # deletion KEEPS the iteration snapshot: Lua allows nil-ing
            # the current field during traversal; next() skips keys no
            # longer present when emitting
            self.hash.pop(key, None)
        else:
            if key not in self.hash:
                self._iter_cache = None  # key set grew (undefined in Lua
                # during traversal; new traversals need a fresh snapshot)
            self.hash[key] = value

    def length(self) -> int:
        # a border: n where t[n] ~= nil and t[n+1] == nil
        n = 0
        while (n + 1) in self.hash:
            n += 1
        return n

    def __repr__(self):  # debug aid only; Lua-side uses lua_tostring
        return f"LuaTable({len(self.hash)} slots)"


def normalize_key(key):
    # Lua: t[1.0] is t[1]
    if isinstance(key, float) and key.is_integer():
        return int(key)
    if isinstance(key, bool):  # bool is an int subclass in Python — keep distinct
        return key
    return key


def lua_tostring(v) -> str:
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if v != v:
            return "nan"
        if v == math.inf:
            return "inf"
        if v == -math.inf:
            return "-inf"
        if v.is_integer() and abs(v) < 1e16:
            return f"{v:.1f}"
        return repr(v)
    if isinstance(v, str):
        return v
    if isinstance(v, LuaTable):
        if v.metatable is not None:
            mm = v.metatable.get("__tostring")
            if mm is not None:
                # call the metamethod exactly once — it may side-effect
                out = call_value(mm, [v])
                return lua_tostring(out[0] if out else None)
        return f"table: 0x{id(v):012x}"
    if callable(v):
        return f"function: 0x{id(v):012x}"
    return str(v)


def lua_truthy(v) -> bool:
    return v is not None and v is not False


def lua_type(v) -> str:
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, LuaTable):
        return "table"
    if callable(v):
        return "function"
    return "userdata"


def tonumber(v, base=None):
    if base is not None:
        if not isinstance(v, str):
            return None
        try:
            return int(v.strip(), int(base))
        except ValueError:
            return None
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        s = v.strip()
        try:
            if s.lower().startswith(("0x", "-0x")):
                return int(s, 16)
            if any(c in s for c in ".eE") and not s.lower().startswith("0x"):
                return float(s)
            return int(s)
        except ValueError:
            try:
                return float(s)
            except ValueError:
                return None
    return None


# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

KEYWORDS = {
    "and", "break", "do", "else", "elseif", "end", "false", "for", "function",
    "goto", "if", "in", "local", "nil", "not", "or", "repeat", "return",
    "then", "true", "until", "while",
}

_SYMBOLS = [
    "...", "..", ".", "==", "~=", "<=", ">=", "<<", ">>", "//", "<", ">",
    "=", "(", ")", "{", "}", "[", "]", ";", ":", "::", ",", "+", "-", "*",
    "/", "%", "^", "#", "&", "|", "~",
]
_SYMBOLS.sort(key=len, reverse=True)

_ESCAPES = {
    "a": "\a", "b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t",
    "v": "\v", "\\": "\\", '"': '"', "'": "'", "\n": "\n",
}


class Token:
    __slots__ = ("kind", "value", "line")

    def __init__(self, kind, value, line):
        self.kind = kind  # 'name' | 'number' | 'string' | 'sym' | 'kw' | 'eof'
        self.value = value
        self.line = line

    def __repr__(self):
        return f"Token({self.kind},{self.value!r},l{self.line})"


def tokenize(src: str, chunkname: str = "chunk") -> list[Token]:
    toks: list[Token] = []
    i, n, line = 0, len(src), 1

    def err(msg):
        raise LuaError(f"{chunkname}:{line}: {msg}")

    def long_bracket(j):
        # [[ ... ]] / [=[ ... ]=]; returns (content, next_index) or None
        nonlocal line
        if src[j] != "[":
            return None
        k = j + 1
        eqs = 0
        while k < n and src[k] == "=":
            eqs += 1
            k += 1
        if k >= n or src[k] != "[":
            return None
        k += 1
        if k < n and src[k] == "\n":  # skip first newline per Lua
            line += 1
            k += 1
        close = "]" + "=" * eqs + "]"
        end = src.find(close, k)
        if end < 0:
            err("unfinished long bracket")
        content = src[k:end]
        line += content.count("\n")
        return content, end + len(close)

    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if src.startswith("--", i):
            lb = long_bracket(i + 2) if i + 2 < n else None
            if lb is not None:
                _, i = lb
                continue
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "[" and i + 1 < n and src[i + 1] in "[=":
            lb = long_bracket(i)
            if lb is not None:
                content, i = lb
                toks.append(Token("string", content, line))
                continue
        if c in "'\"":
            q, j, buf = c, i + 1, []
            while j < n and src[j] != q:
                ch = src[j]
                if ch == "\n":
                    err("unfinished string")
                if ch == "\\":
                    j += 1
                    if j >= n:
                        err("unfinished string")
                    e = src[j]
                    if e in _ESCAPES:
                        buf.append(_ESCAPES[e])
                        if e == "\n":
                            line += 1
                        j += 1
                    elif e == "x":
                        buf.append(chr(int(src[j + 1 : j + 3], 16)))
                        j += 3
                    elif e.isdigit():
                        k = j
                        while k < n and k < j + 3 and src[k].isdigit():
                            k += 1
                        buf.append(chr(int(src[j:k])))
                        j = k
                    elif e == "z":  # skip whitespace
                        j += 1
                        while j < n and src[j] in " \t\r\n":
                            if src[j] == "\n":
                                line += 1
                            j += 1
                    else:
                        err(f"invalid escape '\\{e}'")
                else:
                    buf.append(ch)
                    j += 1
            if j >= n:
                err("unfinished string")
            toks.append(Token("string", "".join(buf), line))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            is_hex = src.startswith(("0x", "0X"), i)
            if is_hex:
                j = i + 2
                while j < n and (src[j] in "0123456789abcdefABCDEF.pP" or
                                 (src[j] in "+-" and src[j - 1] in "pP")):
                    j += 1
            else:
                while j < n and (src[j].isdigit() or src[j] in ".eE" or
                                 (src[j] in "+-" and src[j - 1] in "eE")):
                    j += 1
            text = src[i:j]
            try:
                if is_hex:
                    num = int(text, 16)
                elif any(ch in text for ch in ".eE"):
                    num = float(text)
                else:
                    num = int(text)
            except ValueError:
                err(f"malformed number near '{text}'")
            toks.append(Token("number", num, line))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            word = src[i:j]
            toks.append(Token("kw" if word in KEYWORDS else "name", word, line))
            i = j
            continue
        for sym in _SYMBOLS:
            if src.startswith(sym, i):
                toks.append(Token("sym", sym, line))
                i += len(sym)
                break
        else:
            err(f"unexpected character {c!r}")
    toks.append(Token("eof", None, line))
    return toks


# ---------------------------------------------------------------------------
# Parser — AST nodes are tuples: (op, ...); first element is a str tag
# ---------------------------------------------------------------------------


class Parser:
    def __init__(self, toks: list[Token], chunkname: str):
        self.toks = toks
        self.pos = 0
        self.chunkname = chunkname

    # -- token helpers
    def peek(self) -> Token:
        return self.toks[self.pos]

    def next(self) -> Token:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def check(self, kind, value=None) -> bool:
        t = self.peek()
        return t.kind == kind and (value is None or t.value == value)

    def accept(self, kind, value=None):
        if self.check(kind, value):
            return self.next()
        return None

    def expect(self, kind, value=None) -> Token:
        t = self.peek()
        if t.kind != kind or (value is not None and t.value != value):
            raise LuaError(
                f"{self.chunkname}:{t.line}: expected "
                f"{value or kind}, got {t.value!r}"
            )
        return self.next()

    # -- grammar
    def parse_chunk(self):
        body = self.parse_block()
        self.expect("eof")
        return ("block", body)

    def parse_block(self):
        stats = []
        while True:
            t = self.peek()
            if t.kind == "eof" or (
                t.kind == "kw" and t.value in ("end", "else", "elseif", "until")
            ):
                break
            if t.kind == "sym" and t.value == ";":
                self.next()
                continue
            if t.kind == "kw" and t.value == "return":
                self.next()
                exps = []
                t2 = self.peek()
                if not (
                    t2.kind == "eof"
                    or (t2.kind == "kw" and t2.value in ("end", "else", "elseif", "until"))
                    or (t2.kind == "sym" and t2.value == ";")
                ):
                    exps = self.parse_explist()
                self.accept("sym", ";")
                stats.append(("return", exps, t.line))
                break
            stats.append(self.parse_statement())
        return stats

    def parse_statement(self):
        t = self.peek()
        line = t.line
        if t.kind == "kw":
            kw = t.value
            if kw == "break":
                self.next()
                return ("break", line)
            if kw == "goto":
                raise LuaUnsupportedFeature(f"{self.chunkname}:{line}: goto is not supported")
            if kw == "do":
                self.next()
                body = self.parse_block()
                self.expect("kw", "end")
                return ("do", body, line)
            if kw == "while":
                self.next()
                cond = self.parse_exp()
                self.expect("kw", "do")
                body = self.parse_block()
                self.expect("kw", "end")
                return ("while", cond, body, line)
            if kw == "repeat":
                self.next()
                body = self.parse_block()
                self.expect("kw", "until")
                cond = self.parse_exp()
                return ("repeat", body, cond, line)
            if kw == "if":
                self.next()
                arms = []
                cond = self.parse_exp()
                self.expect("kw", "then")
                arms.append((cond, self.parse_block()))
                while self.check("kw", "elseif"):
                    self.next()
                    c2 = self.parse_exp()
                    self.expect("kw", "then")
                    arms.append((c2, self.parse_block()))
                els = None
                if self.accept("kw", "else"):
                    els = self.parse_block()
                self.expect("kw", "end")
                return ("if", arms, els, line)
            if kw == "for":
                self.next()
                name1 = self.expect("name").value
                if self.accept("sym", "="):
                    start = self.parse_exp()
                    self.expect("sym", ",")
                    stop = self.parse_exp()
                    step = None
                    if self.accept("sym", ","):
                        step = self.parse_exp()
                    self.expect("kw", "do")
                    body = self.parse_block()
                    self.expect("kw", "end")
                    return ("fornum", name1, start, stop, step, body, line)
                names = [name1]
                while self.accept("sym", ","):
                    names.append(self.expect("name").value)
                self.expect("kw", "in")
                exps = self.parse_explist()
                self.expect("kw", "do")
                body = self.parse_block()
                self.expect("kw", "end")
                return ("forin", names, exps, body, line)
            if kw == "function":
                self.next()
                # funcname: Name {'.' Name} [':' Name]
                target = ("name", self.expect("name").value, line)
                is_method = False
                while True:
                    if self.accept("sym", "."):
                        target = ("index", target, ("const", self.expect("name").value), line)
                    elif self.accept("sym", ":"):
                        target = ("index", target, ("const", self.expect("name").value), line)
                        is_method = True
                        break
                    else:
                        break
                fn = self.parse_funcbody(line, is_method)
                return ("assign", [target], [fn], line)
            if kw == "local":
                self.next()
                if self.accept("kw", "function"):
                    name = self.expect("name").value
                    fn = self.parse_funcbody(line, False)
                    return ("localfunc", name, fn, line)
                names = [self.expect("name").value]
                # skip attribs <const>/<close>
                if self.accept("sym", "<"):
                    self.expect("name")
                    self.expect("sym", ">")
                while self.accept("sym", ","):
                    names.append(self.expect("name").value)
                    if self.accept("sym", "<"):
                        self.expect("name")
                        self.expect("sym", ">")
                exps = []
                if self.accept("sym", "="):
                    exps = self.parse_explist()
                return ("local", names, exps, line)
        # exprstat: assignment or call
        e = self.parse_suffixedexp()
        if self.check("sym", "=") or self.check("sym", ","):
            targets = [e]
            while self.accept("sym", ","):
                targets.append(self.parse_suffixedexp())
            self.expect("sym", "=")
            exps = self.parse_explist()
            for tgt in targets:
                if tgt[0] not in ("name", "index"):
                    raise LuaError(f"{self.chunkname}:{line}: cannot assign to this expression")
            return ("assign", targets, exps, line)
        if e[0] not in ("call", "methodcall"):
            raise LuaError(f"{self.chunkname}:{line}: syntax error (expression is not a statement)")
        return ("exprstat", e, line)

    def parse_funcbody(self, line, is_method):
        self.expect("sym", "(")
        params, varargs = [], False
        if is_method:
            params.append("self")
        if not self.check("sym", ")"):
            while True:
                if self.accept("sym", "..."):
                    varargs = True
                    break
                params.append(self.expect("name").value)
                if not self.accept("sym", ","):
                    break
        self.expect("sym", ")")
        body = self.parse_block()
        self.expect("kw", "end")
        return ("function", params, varargs, body, line)

    def parse_explist(self):
        exps = [self.parse_exp()]
        while self.accept("sym", ","):
            exps.append(self.parse_exp())
        return exps

    _BINPRI = {
        "or": (1, 1), "and": (2, 2),
        "<": (3, 3), ">": (3, 3), "<=": (3, 3), ">=": (3, 3), "~=": (3, 3), "==": (3, 3),
        "|": (4, 4), "~": (5, 5), "&": (6, 6), "<<": (7, 7), ">>": (7, 7),
        "..": (9, 8),  # right assoc
        "+": (10, 10), "-": (10, 10),
        "*": (11, 11), "/": (11, 11), "//": (11, 11), "%": (11, 11),
        "^": (14, 13),  # right assoc
    }
    _UNARY_PRI = 12

    def parse_exp(self, limit=0):
        t = self.peek()
        if (t.kind == "sym" and t.value in ("-", "#", "~")) or (
            t.kind == "kw" and t.value == "not"
        ):
            self.next()
            operand = self.parse_exp(self._UNARY_PRI)
            left = ("unop", t.value, operand, t.line)
        else:
            left = self.parse_simpleexp()
        while True:
            t = self.peek()
            op = None
            if t.kind == "sym" and t.value in self._BINPRI:
                op = t.value
            elif t.kind == "kw" and t.value in ("and", "or"):
                op = t.value
            if op is None:
                break
            lpri, rpri = self._BINPRI[op]
            if lpri <= limit:
                break
            self.next()
            right = self.parse_exp(rpri)
            left = ("binop", op, left, right, t.line)
        return left

    def parse_simpleexp(self):
        t = self.peek()
        if t.kind == "number":
            self.next()
            return ("const", t.value)
        if t.kind == "string":
            self.next()
            return ("const", t.value)
        if t.kind == "kw":
            if t.value == "nil":
                self.next()
                return ("const", None)
            if t.value == "true":
                self.next()
                return ("const", True)
            if t.value == "false":
                self.next()
                return ("const", False)
            if t.value == "function":
                self.next()
                return self.parse_funcbody(t.line, False)
        if t.kind == "sym":
            if t.value == "...":
                self.next()
                return ("varargs", t.line)
            if t.value == "{":
                return self.parse_table()
        return self.parse_suffixedexp()

    def parse_primaryexp(self):
        t = self.peek()
        if t.kind == "name":
            self.next()
            return ("name", t.value, t.line)
        if t.kind == "sym" and t.value == "(":
            self.next()
            e = self.parse_exp()
            self.expect("sym", ")")
            return ("paren", e)
        raise LuaError(f"{self.chunkname}:{t.line}: unexpected symbol near {t.value!r}")

    def parse_suffixedexp(self):
        e = self.parse_primaryexp()
        while True:
            t = self.peek()
            if t.kind == "sym" and t.value == ".":
                self.next()
                name = self.expect("name").value
                e = ("index", e, ("const", name), t.line)
            elif t.kind == "sym" and t.value == "[":
                self.next()
                k = self.parse_exp()
                self.expect("sym", "]")
                e = ("index", e, k, t.line)
            elif t.kind == "sym" and t.value == ":":
                self.next()
                name = self.expect("name").value
                args = self.parse_callargs()
                e = ("methodcall", e, name, args, t.line)
            elif (t.kind == "sym" and t.value in ("(", "{")) or t.kind == "string":
                args = self.parse_callargs()
                e = ("call", e, args, t.line)
            else:
                return e

    def parse_callargs(self):
        t = self.peek()
        if t.kind == "string":
            self.next()
            return [("const", t.value)]
        if t.kind == "sym" and t.value == "{":
            return [self.parse_table()]
        self.expect("sym", "(")
        args = []
        if not self.check("sym", ")"):
            args = self.parse_explist()
        self.expect("sym", ")")
        return args

    def parse_table(self):
        line = self.expect("sym", "{").line
        fields = []  # ('item', exp) | ('kv', keyexp, valexp)
        while not self.check("sym", "}"):
            t = self.peek()
            if t.kind == "sym" and t.value == "[":
                self.next()
                k = self.parse_exp()
                self.expect("sym", "]")
                self.expect("sym", "=")
                v = self.parse_exp()
                fields.append(("kv", k, v))
            elif t.kind == "name" and self.toks[self.pos + 1].kind == "sym" \
                    and self.toks[self.pos + 1].value == "=":
                self.next()
                self.next()
                v = self.parse_exp()
                fields.append(("kv", ("const", t.value), v))
            else:
                fields.append(("item", self.parse_exp()))
            if not (self.accept("sym", ",") or self.accept("sym", ";")):
                break
        self.expect("sym", "}")
        return ("table", fields, line)


# ---------------------------------------------------------------------------
# Evaluator
# ---------------------------------------------------------------------------


class _Break(Exception):
    pass


class _Return(Exception):
    def __init__(self, values):
        self.values = values


class Scope:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars: dict = {}
        self.parent = parent

    def lookup(self, name):
        s = self
        while s is not None:
            if name in s.vars:
                return s
            s = s.parent
        return None


class LuaFunction:
    __slots__ = ("params", "varargs", "body", "scope", "interp", "name")

    def __init__(self, params, varargs, body, scope, interp, name="?"):
        self.params = params
        self.varargs = varargs
        self.body = body
        self.scope = scope
        self.interp = interp
        self.name = name

    def __call__(self, *args):
        return self.interp.call_function(self, list(args))


def call_value(fn, args: list) -> list:
    """Call a Lua-visible callable; returns the (possibly empty) list of
    return values. Host callables may return None | value | tuple/list."""
    if isinstance(fn, LuaFunction):
        return fn.interp.call_function(fn, args)
    if isinstance(fn, LuaTable):
        if fn.metatable is not None:
            mm = fn.metatable.get("__call")
            if mm is not None:
                return call_value(mm, [fn] + args)
        raise LuaError("attempt to call a table value")
    if callable(fn):
        out = fn(*args)
        if out is None:
            return []
        if isinstance(out, tuple):
            return list(out)
        if isinstance(out, list):
            return out
        return [out]
    raise LuaError(f"attempt to call a {lua_type(fn)} value")


class Interp:
    #: instruction budget — hooks must terminate (the reference bounds
    #: Lua scripts with a context deadline; we bound evaluation steps)
    MAX_STEPS = 20_000_000

    def __init__(self, globals_table: LuaTable, chunkname="chunk"):
        self.globals = globals_table
        self.chunkname = chunkname
        self.steps = 0

    # -- driving
    def run(self, ast, varargs=None) -> list:
        scope = Scope()
        scope.vars["..."] = varargs or []
        try:
            self.exec_block(ast[1], scope)
        except _Return as r:
            return r.values
        return []

    def _tick(self, line):
        self.steps += 1
        if self.steps > self.MAX_STEPS:
            raise LuaError(f"{self.chunkname}:{line}: instruction budget exceeded")

    # -- statements
    def exec_block(self, stats, scope: Scope):
        for st in stats:
            self.exec_stat(st, scope)

    def exec_stat(self, st, scope: Scope):
        tag = st[0]
        self._tick(st[-1] if isinstance(st[-1], int) else 0)
        if tag == "local":
            _, names, exps, _line = st
            vals = self.eval_explist(exps, scope, want=len(names))
            for nm, v in zip(names, vals):
                scope.vars[nm] = v
            return
        if tag == "localfunc":
            _, name, fnexp, _line = st
            scope.vars[name] = None  # visible to itself (recursion)
            fn = self.eval_exp(fnexp, scope)
            fn.name = name
            scope.vars[name] = fn
            return
        if tag == "assign":
            _, targets, exps, _line = st
            vals = self.eval_explist(exps, scope, want=len(targets))
            for tgt, v in zip(targets, vals):
                self.assign(tgt, v, scope)
            return
        if tag == "exprstat":
            self.eval_multi(st[1], scope)
            return
        if tag == "do":
            self.exec_block(st[1], Scope(scope))
            return
        if tag == "if":
            _, arms, els, _line = st
            for cond, body in arms:
                if lua_truthy(self.eval_exp(cond, scope)):
                    self.exec_block(body, Scope(scope))
                    return
            if els is not None:
                self.exec_block(els, Scope(scope))
            return
        if tag == "while":
            _, cond, body, line = st
            while lua_truthy(self.eval_exp(cond, scope)):
                self._tick(line)
                try:
                    self.exec_block(body, Scope(scope))
                except _Break:
                    break
            return
        if tag == "repeat":
            _, body, cond, line = st
            while True:
                self._tick(line)
                inner = Scope(scope)
                try:
                    self.exec_block(body, inner)
                except _Break:
                    break
                if lua_truthy(self.eval_exp(cond, inner)):
                    break
            return
        if tag == "fornum":
            _, name, e1, e2, e3, body, line = st
            start = self._arith_num(self.eval_exp(e1, scope), line)
            stop = self._arith_num(self.eval_exp(e2, scope), line)
            step = self._arith_num(self.eval_exp(e3, scope), line) if e3 else 1
            if step == 0:
                raise LuaError(f"{self.chunkname}:{line}: 'for' step is zero")
            i = start
            while (step > 0 and i <= stop) or (step < 0 and i >= stop):
                self._tick(line)
                inner = Scope(scope)
                inner.vars[name] = i
                try:
                    self.exec_block(body, inner)
                except _Break:
                    break
                i += step
            return
        if tag == "forin":
            _, names, exps, body, line = st
            ctrl = self.eval_explist(exps, scope, want=3)
            f, s, var = ctrl[0], ctrl[1], ctrl[2]
            while True:
                self._tick(line)
                rets = call_value(f, [s, var])
                rets += [None] * (len(names) - len(rets))
                if rets[0] is None:
                    break
                var = rets[0]
                inner = Scope(scope)
                for nm, v in zip(names, rets):
                    inner.vars[nm] = v
                try:
                    self.exec_block(body, inner)
                except _Break:
                    break
            return
        if tag == "return":
            raise _Return(self.eval_explist(st[1], scope, want=-1))
        if tag == "break":
            raise _Break()
        raise LuaError(f"unknown statement {tag}")

    def assign(self, target, value, scope: Scope):
        if target[0] == "name":
            name = target[1]
            s = scope.lookup(name)
            if s is not None:
                s.vars[name] = value
            else:
                self.setindex(self.globals, name, value)
            return
        if target[0] == "index":
            obj = self.eval_exp(target[1], scope)
            key = self.eval_exp(target[2], scope)
            self.setindex(obj, key, value)
            return
        raise LuaError("cannot assign")

    # -- index with metatables
    def getindex(self, obj, key):
        if isinstance(obj, LuaTable):
            v = obj.get(key)
            if v is not None:
                return v
            if obj.metatable is not None:
                mm = obj.metatable.get("__index")
                if isinstance(mm, LuaTable):
                    return self.getindex(mm, key)
                if mm is not None:
                    out = call_value(mm, [obj, key])
                    return out[0] if out else None
            return None
        if isinstance(obj, str):
            from lakefs_spark.lua.stdlib import STRING_LIB

            return STRING_LIB.get(key)
        if obj is None:
            raise LuaError(f"attempt to index a nil value (key {lua_tostring(key)!r})")
        raise LuaError(f"attempt to index a {lua_type(obj)} value")

    def setindex(self, obj, key, value):
        if isinstance(obj, LuaTable):
            if obj.get(key) is None and obj.metatable is not None:
                mm = obj.metatable.get("__newindex")
                if isinstance(mm, LuaTable):
                    return self.setindex(mm, key, value)
                if mm is not None:
                    call_value(mm, [obj, key, value])
                    return
            obj.set(key, value)
            return
        raise LuaError(f"attempt to index a {lua_type(obj)} value")

    # -- expressions
    def eval_explist(self, exps, scope, want: int) -> list:
        """Evaluate an expression list with Lua's expansion rule: every
        exp but the last truncates to 1 value; the last expands. want=-1
        returns all; otherwise pads/truncates to exactly ``want``."""
        vals: list = []
        for i, e in enumerate(exps):
            if i == len(exps) - 1:
                vals.extend(self.eval_multi(e, scope))
            else:
                vals.append(self.eval_exp(e, scope))
        if want < 0:
            return vals
        vals = vals[:want]
        vals += [None] * (want - len(vals))
        return vals

    def eval_multi(self, e, scope) -> list:
        tag = e[0]
        if tag == "call":
            fn = self.eval_exp(e[1], scope)
            args = self.eval_explist(e[2], scope, want=-1)
            try:
                return call_value(fn, args)
            except LuaError:
                raise
            except (_Break, _Return):
                raise
            except RecursionError:
                raise LuaError(f"{self.chunkname}:{e[3]}: stack overflow")
        if tag == "methodcall":
            obj = self.eval_exp(e[1], scope)
            fn = self.getindex(obj, e[2])
            if fn is None:
                raise LuaError(
                    f"{self.chunkname}:{e[4]}: attempt to call a nil value "
                    f"(method '{e[2]}')"
                )
            args = [obj] + self.eval_explist(e[3], scope, want=-1)
            return call_value(fn, args)
        if tag == "varargs":
            s = scope
            while s is not None:
                if "..." in s.vars:
                    return list(s.vars["..."])
                s = s.parent
            return []
        return [self.eval_exp(e, scope)]

    def eval_exp(self, e, scope):
        tag = e[0]
        if tag == "const":
            return e[1]
        if tag == "name":
            s = scope.lookup(e[1])
            if s is not None:
                return s.vars[e[1]]
            return self.globals.get(e[1])
        if tag == "paren":
            return self.eval_exp(e[1], scope)
        if tag == "index":
            obj = self.eval_exp(e[1], scope)
            key = self.eval_exp(e[2], scope)
            try:
                return self.getindex(obj, key)
            except LuaError as le:
                if "attempt to index a nil" in str(le.value) and e[1][0] in ("name", "index"):
                    where = e[1][1] if e[1][0] == "name" else "?"
                    raise LuaError(
                        f"{self.chunkname}:{e[3]}: attempt to index a nil value "
                        f"('{where}')"
                    ) from None
                raise
        if tag in ("call", "methodcall", "varargs"):
            out = self.eval_multi(e, scope)
            return out[0] if out else None
        if tag == "function":
            _, params, varargs, body, line = e
            return LuaFunction(params, varargs, body, scope, self)
        if tag == "table":
            t = LuaTable()
            arr = 1
            fields = e[1]
            for i, f in enumerate(fields):
                if f[0] == "kv":
                    k = self.eval_exp(f[1], scope)
                    t.set(k, self.eval_exp(f[2], scope))
                else:
                    if i == len(fields) - 1:
                        for v in self.eval_multi(f[1], scope):
                            t.set(arr, v)
                            arr += 1
                    else:
                        t.set(arr, self.eval_exp(f[1], scope))
                        arr += 1
            return t
        if tag == "binop":
            return self.eval_binop(e, scope)
        if tag == "unop":
            return self.eval_unop(e, scope)
        raise LuaError(f"unknown expression {tag}")

    def _arith_num(self, v, line):
        n = tonumber(v) if not isinstance(v, bool) else None
        if n is None:
            raise LuaError(
                f"{self.chunkname}:{line}: attempt to perform arithmetic on a "
                f"{lua_type(v)} value"
            )
        return n

    def eval_binop(self, e, scope):
        _, op, le, re_, line = e
        if op == "and":
            lv = self.eval_exp(le, scope)
            return self.eval_exp(re_, scope) if lua_truthy(lv) else lv
        if op == "or":
            lv = self.eval_exp(le, scope)
            return lv if lua_truthy(lv) else self.eval_exp(re_, scope)
        a = self.eval_exp(le, scope)
        b = self.eval_exp(re_, scope)
        if op == "..":
            for v in (a, b):
                if not isinstance(v, (str, int, float)) or isinstance(v, bool):
                    raise LuaError(
                        f"{self.chunkname}:{line}: attempt to concatenate a "
                        f"{lua_type(v)} value"
                    )
            return lua_tostring(a) + lua_tostring(b)
        if op == "==":
            return self._eq(a, b)
        if op == "~=":
            return not self._eq(a, b)
        if op in ("<", "<=", ">", ">="):
            if isinstance(a, str) and isinstance(b, str):
                pass
            elif (
                isinstance(a, (int, float)) and not isinstance(a, bool)
                and isinstance(b, (int, float)) and not isinstance(b, bool)
            ):
                pass
            else:
                mm = self._compare_mm(a, b, op)
                if mm is not None:
                    return mm
                raise LuaError(
                    f"{self.chunkname}:{line}: attempt to compare "
                    f"{lua_type(a)} with {lua_type(b)}"
                )
            if op == "<":
                return a < b
            if op == "<=":
                return a <= b
            if op == ">":
                return a > b
            return a >= b
        # arithmetic
        x = self._arith_num(a, line)
        y = self._arith_num(b, line)
        if op == "+":
            return x + y
        if op == "-":
            return x - y
        if op == "*":
            return x * y
        if op == "/":
            if y == 0:
                return math.inf if x > 0 else (-math.inf if x < 0 else math.nan)
            return x / y
        if op == "%":
            if y == 0:
                raise LuaError(f"{self.chunkname}:{line}: attempt to perform 'n%%0'")
            return x - math.floor(x / y) * y
        if op == "//":
            if y == 0:
                raise LuaError(f"{self.chunkname}:{line}: attempt to perform 'n//0'")
            out = math.floor(x / y)
            return out if isinstance(x, float) or isinstance(y, float) else int(out)
        if op == "^":
            return float(x) ** float(y)
        if op in ("&", "|", "~", "<<", ">>"):
            xi, yi = int(x), int(y)
            if op == "&":
                return xi & yi
            if op == "|":
                return xi | yi
            if op == "~":
                return xi ^ yi
            if op == "<<":
                return (xi << yi) & ((1 << 64) - 1) if yi >= 0 else xi >> -yi
            return xi >> yi if yi >= 0 else xi << -yi
        raise LuaError(f"unknown operator {op}")

    def _compare_mm(self, a, b, op):
        for v in (a, b):
            if isinstance(v, LuaTable) and v.metatable is not None:
                name = {"<": "__lt", "<=": "__le", ">": "__lt", ">=": "__le"}[op]
                mm = v.metatable.get(name)
                if mm is not None:
                    if op in (">", ">="):
                        a, b = b, a
                    out = call_value(mm, [a, b])
                    return lua_truthy(out[0] if out else None)
        return None

    @staticmethod
    def _eq(a, b):
        if isinstance(a, bool) or isinstance(b, bool):
            return a is b
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return a == b
        if type(a) is type(b) and isinstance(a, str):
            return a == b
        if a is b:
            return True
        if isinstance(a, LuaTable) and isinstance(b, LuaTable):
            for v in (a, b):
                if v.metatable is not None:
                    mm = v.metatable.get("__eq")
                    if mm is not None:
                        out = call_value(mm, [a, b])
                        return lua_truthy(out[0] if out else None)
        return False

    def eval_unop(self, e, scope):
        _, op, operand, line = e
        v = self.eval_exp(operand, scope)
        if op == "not":
            return not lua_truthy(v)
        if op == "-":
            return -self._arith_num(v, line)
        if op == "~":
            return ~int(self._arith_num(v, line))
        if op == "#":
            if isinstance(v, str):
                return len(v)
            if isinstance(v, LuaTable):
                if v.metatable is not None:
                    mm = v.metatable.get("__len")
                    if mm is not None:
                        out = call_value(mm, [v])
                        return out[0] if out else None
                return v.length()
            raise LuaError(
                f"{self.chunkname}:{line}: attempt to get length of a "
                f"{lua_type(v)} value"
            )
        raise LuaError(f"unknown unary operator {op}")

    # -- function calls
    def call_function(self, fn: LuaFunction, args: list) -> list:
        scope = Scope(fn.scope)
        for i, p in enumerate(fn.params):
            scope.vars[p] = args[i] if i < len(args) else None
        scope.vars["..."] = args[len(fn.params):] if fn.varargs else []
        try:
            self.exec_block(fn.body, scope)
        except _Return as r:
            return r.values
        return []


def compile_lua(source: str, chunkname: str = "chunk"):
    """Parse Lua source to an AST (raises LuaError on syntax errors)."""
    return Parser(tokenize(source, chunkname), chunkname).parse_chunk()


def run_lua(source: str, globals_table: LuaTable, chunkname: str = "chunk") -> list:
    """Compile and run a Lua chunk; returns its return values."""
    ast = compile_lua(source, chunkname)
    return Interp(globals_table, chunkname).run(ast)
