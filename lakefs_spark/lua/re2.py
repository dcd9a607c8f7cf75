"""Linear-time regular expressions for hook-visible surfaces.

Go's ``regexp`` package (what the reference binds as the Lua ``regexp``
module — pkg/actions/lua/regexp/regexp.go) is RE2: guaranteed
O(pattern × subject) time, immune to catastrophic backtracking.
Python's ``re`` is a backtracking engine, so a hook pattern like
``(a+)+$`` matched against attacker-supplied commit metadata (the
commit_metadata_validator shape) could stall a commit indefinitely —
and the Lua interpreter's instruction budget cannot bound time spent
inside one C-level regex call.

This module is a small Pike VM — Thompson NFA simulation with
capture-group tracking and thread priority (R. Pike's sam editor;
the construction RE2 itself uses for its general case). Worst-case
time is O(len(program) × len(subject)) for EVERY pattern; memory is
O(len(program)). Thread priority gives Go/Perl "leftmost-first"
match semantics, which is exactly what Go's regexp documents.

Supported syntax (the RE2 subset curated hooks use):
  literals, ``.``, escapes (``\\d \\D \\w \\W \\s \\S \\n \\t \\r \\f
  \\v \\0 \\xHH \\x{...}`` and escaped punctuation), character classes
  with ranges / negation / class escapes / POSIX ``[:alpha:]`` names,
  anchors ``^ $ \\A \\z \\b \\B``, groups ``(...)`` ``(?:...)`` and
  scoped flags ``(?i:...)``, inline flags ``(?i) (?s) (?m)``,
  alternation, quantifiers ``* + ? {m} {m,} {m,n}`` plus lazy
  variants, ``\\Q...\\E`` literal quoting.

Anything else — lookarounds, ``\\p{...}`` unicode classes, named
groups (``(?P<..>``) — raises :class:`UnsupportedRegex`, a loud
failure, never a silent mis-match. Backreferences do not exist in RE2
either, so hooks written for the reference cannot be using them.
"""

from __future__ import annotations

from typing import Callable, Optional

MAX_PROGRAM = 50_000  # instruction cap: bounds memory AND per-char work
MAX_REPEAT = 1_000  # {m,n} expansion cap (Go's limit is also 1000)

_WORD = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")

_POSIX_CLASSES: dict[str, Callable[[str], bool]] = {
    "alpha": str.isalpha,
    "digit": str.isdigit,
    "alnum": str.isalnum,
    "space": str.isspace,
    "upper": str.isupper,
    "lower": str.islower,
    "word": lambda c: c in _WORD or c.isalnum(),
    "punct": lambda c: not c.isalnum() and not c.isspace() and c.isprintable(),
    "xdigit": lambda c: c in "0123456789abcdefABCDEF",
    "cntrl": lambda c: ord(c) < 0x20 or ord(c) == 0x7F,
    "graph": lambda c: c.isprintable() and not c.isspace(),
    "print": lambda c: c.isprintable() or c == " ",
    "blank": lambda c: c in " \t",
}


class UnsupportedRegex(ValueError):
    """Pattern uses a construct outside the supported RE2 subset."""


class RegexSyntaxError(ValueError):
    """Pattern is malformed (unbalanced parens, bad range, ...)."""


# ---------------------------------------------------------------------------
# character predicates (compiled once per class/literal)
# ---------------------------------------------------------------------------


def _lit_pred(ch: str, ci: bool) -> Callable[[str], bool]:
    if ci:
        lo = ch.lower()
        return lambda c: c.lower() == lo
    return lambda c: c == ch


def _shorthand_pred(letter: str) -> Callable[[str], bool]:
    if letter == "d":
        return lambda c: c.isdigit()
    if letter == "D":
        return lambda c: not c.isdigit()
    if letter == "w":
        return lambda c: c in _WORD or c.isalnum()
    if letter == "W":
        return lambda c: not (c in _WORD or c.isalnum())
    if letter == "s":
        return lambda c: c.isspace()
    if letter == "S":
        return lambda c: not c.isspace()
    raise RegexSyntaxError(f"unknown class escape \\{letter}")


def _class_pred(
    items: list, negated: bool, ci: bool
) -> Callable[[str], bool]:
    """items: list of ('ch', c) | ('range', lo, hi) | ('pred', fn)."""

    def base(c: str) -> bool:
        for it in items:
            kind = it[0]
            if kind == "ch":
                if c == it[1]:
                    return True
            elif kind == "range":
                if it[1] <= c <= it[2]:
                    return True
            else:
                if it[1](c):
                    return True
        return False

    if ci:

        def pred(c: str) -> bool:
            r = base(c) or base(c.lower()) or base(c.upper())
            return (not r) if negated else r

        return pred
    if negated:
        return lambda c: not base(c)
    return base


# ---------------------------------------------------------------------------
# parser → program (compiles directly, no AST pass)
# ---------------------------------------------------------------------------

# instruction opcodes
CHAR, SPLIT, JMP, SAVE, ASSERT, MATCH = range(6)


class _Flags:
    __slots__ = ("i", "s", "m")

    def __init__(self, i=False, s=False, m=False):
        self.i, self.s, self.m = i, s, m

    def copy(self) -> "_Flags":
        return _Flags(self.i, self.s, self.m)


class _Parser:
    """Recursive-descent parse of the RE2 subset into a fragment tree,
    then emission into a flat instruction list."""

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0
        self.ngroups = 0

    # -- tokens ------------------------------------------------------------

    def _peek(self) -> str:
        return self.p[self.i] if self.i < len(self.p) else ""

    def _next(self) -> str:
        c = self._peek()
        self.i += 1
        return c

    def _expect(self, ch: str) -> None:
        if self._next() != ch:
            raise RegexSyntaxError(f"expected {ch!r} at {self.i} in {self.p!r}")

    # -- grammar: alt -> cat ('|' cat)* --------------------------------------

    def parse(self, flags: _Flags):
        node = self._alt(flags)
        if self.i != len(self.p):
            raise RegexSyntaxError(f"unexpected {self._peek()!r} at {self.i}")
        return node

    def _alt(self, flags: _Flags):
        branches = [self._cat(flags)]
        while self._peek() == "|":
            self._next()
            branches.append(self._cat(flags))
        return ("alt", branches) if len(branches) > 1 else branches[0]

    def _cat(self, flags: _Flags):
        parts = []
        while self.i < len(self.p) and self._peek() not in "|)":
            parts.append(self._repeat(flags))
        if not parts:
            return ("empty",)
        return ("cat", parts) if len(parts) > 1 else parts[0]

    def _repeat(self, flags: _Flags):
        atom = self._atom(flags)
        quantified = False
        while True:
            c = self._peek()
            if c in ("*", "+", "?", "{"):
                if c == "{":
                    rep = self._try_counted()
                    if rep is None:
                        break  # literal '{'
                    lo, hi = rep
                    nxt = ("rep", atom, lo, hi, self._lazy())
                else:
                    self._next()
                    kind = {"*": "star", "+": "plus", "?": "quest"}[c]
                    nxt = (kind, atom, self._lazy())
                if quantified:
                    # Go: "invalid nested repetition operator" (a** etc.;
                    # x*? already consumed the ? as laziness above)
                    raise RegexSyntaxError(
                        f"nested repetition operator at {self.i}"
                    )
                atom = nxt
                quantified = True
            else:
                break
        return atom

    def _lazy(self) -> bool:
        if self._peek() == "?":
            self._next()
            return True
        return False

    def _try_counted(self) -> Optional[tuple]:
        """Parse {m} {m,} {m,n} starting at '{'; None if not a counted
        repeat (RE2 treats a non-matching '{' as a literal)."""
        start = self.i
        self._next()  # '{'
        digits = ""
        while self._peek().isdigit():
            digits += self._next()
        if not digits:
            self.i = start
            return None
        lo = int(digits)
        hi = lo
        if self._peek() == ",":
            self._next()
            digits2 = ""
            while self._peek().isdigit():
                digits2 += self._next()
            hi = int(digits2) if digits2 else -1  # -1 = unbounded
        if self._peek() != "}":
            self.i = start
            return None
        self._next()
        if lo > MAX_REPEAT or (hi != -1 and hi > MAX_REPEAT):
            raise UnsupportedRegex(f"repeat count over {MAX_REPEAT}")
        if hi != -1 and hi < lo:
            raise RegexSyntaxError(f"bad repeat {{{lo},{hi}}}")
        return (lo, hi)

    # -- atoms ---------------------------------------------------------------

    def _atom(self, flags: _Flags):
        c = self._next()
        if c == "(":
            return self._group(flags)
        if c == "[":
            return ("class", self._class_items(), flags.i)
        if c == ".":
            return ("any", flags.s)
        if c == "^":
            return ("assert", "^", flags.m)
        if c == "$":
            return ("assert", "$", flags.m)
        if c == "\\":
            return self._escape(flags)
        if c in "*+?":
            raise RegexSyntaxError(f"dangling quantifier {c!r} at {self.i}")
        return ("lit", c, flags.i)

    def _group(self, flags: _Flags):
        if self._peek() == "?":
            self._next()
            c = self._peek()
            if c == ":":
                self._next()
                node = self._alt(flags.copy())
                self._expect(")")
                return node
            if c in "=!<P'":
                raise UnsupportedRegex(
                    "lookarounds / named groups are outside the supported "
                    "RE2 subset"
                )
            # inline flags: (?ims) or (?ims:...) or (?-i) ...
            new = flags.copy()
            neg = False
            while True:
                c = self._next()
                if c == "-":
                    neg = True
                elif c == "i":
                    new.i = not neg
                elif c == "s":
                    new.s = not neg
                elif c == "m":
                    new.m = not neg
                elif c == ":":
                    node = self._alt(new)
                    self._expect(")")
                    return node
                elif c == ")":
                    # (?i) applies to the REMAINDER of the enclosing
                    # group, per RE2: mutate the caller's flags object
                    flags.i, flags.s, flags.m = new.i, new.s, new.m
                    return ("empty",)
                else:
                    raise UnsupportedRegex(f"unsupported group flag {c!r}")
        self.ngroups += 1
        idx = self.ngroups
        node = self._alt(flags.copy())
        self._expect(")")
        return ("group", idx, node)

    def _escape(self, flags: _Flags):
        c = self._next()
        if c == "":
            raise RegexSyntaxError("trailing backslash")
        if c in "dDwWsS":
            return ("class", ([("pred", _shorthand_pred(c))], False), False)
        if c == "b":
            return ("assert", "b", False)
        if c == "B":
            return ("assert", "B", False)
        if c == "A":
            return ("assert", "A", False)
        if c == "z":
            return ("assert", "z", False)
        if c == "Q":
            # \Q...\E literal run
            parts = []
            while self.i < len(self.p):
                if self.p.startswith("\\E", self.i):
                    self.i += 2
                    break
                parts.append(("lit", self._next(), flags.i))
            if not parts:
                return ("empty",)
            return ("cat", parts) if len(parts) > 1 else parts[0]
        if c in ("p", "P"):
            raise UnsupportedRegex("\\p unicode classes are unsupported")
        if c.isdigit() and c != "0":
            raise UnsupportedRegex(
                "backreferences do not exist in RE2 and are unsupported"
            )
        return ("lit", self._escape_char(c), flags.i)

    def _escape_char(self, c: str) -> str:
        simple = {"n": "\n", "t": "\t", "r": "\r", "f": "\f", "v": "\v",
                  "a": "\a"}
        if c in simple:
            return simple[c]
        if c == "0":
            # Go RE2: \0 starts an octal escape of up to three digits
            # total (\0, \01, \012) — \012 is '\n', NOT NUL + "12".
            digits = "0"
            # NB: _peek() returns "" at end-of-pattern, and "" is a
            # substring of any string — the explicit length guard is
            # what keeps `\0` at pattern end from spinning forever
            while len(digits) < 3 and len(self._peek()) == 1 and self._peek() in "01234567":
                digits += self._next()
            return chr(int(digits, 8))
        if c == "x":
            if self._peek() == "{":
                self._next()
                hexs = ""
                while self._peek() != "}":
                    if self.i >= len(self.p):
                        raise RegexSyntaxError("unterminated \\x{...}")
                    hexs += self._next()
                self._next()
            else:
                hexs = self._next() + self._next()
            try:
                return chr(int(hexs, 16))
            except ValueError:
                raise RegexSyntaxError(f"bad hex escape \\x{hexs}") from None
        # escaped punctuation (incl. \\ \. \* etc.) is the literal char
        return c

    def _class_items(self) -> tuple[list, bool]:
        items: list = []
        negated = False
        if self._peek() == "^":
            self._next()
            negated = True
        first = True
        while True:
            if self.i >= len(self.p):
                raise RegexSyntaxError("unterminated character class")
            c = self._next()
            if c == "]" and not first:
                break
            first = False
            if c == "[" and self._peek() == ":":
                # POSIX [:name:]
                j = self.p.find(":]", self.i + 1)
                if j == -1:
                    raise RegexSyntaxError("unterminated [:class:]")
                name = self.p[self.i + 1 : j]
                self.i = j + 2
                pred = _POSIX_CLASSES.get(name)
                if pred is None:
                    raise UnsupportedRegex(f"POSIX class [:{name}:]")
                items.append(("pred", pred))
                continue
            if c == "\\":
                e = self._next()
                if e in "dDwWsS":
                    items.append(("pred", _shorthand_pred(e)))
                    continue
                c = self._escape_char(e)
            # range?
            if self._peek() == "-" and self.i + 1 < len(self.p) and self.p[self.i + 1] != "]":
                self._next()  # '-'
                hi = self._next()
                if hi == "\\":
                    hi = self._escape_char(self._next())
                if hi < c:
                    raise RegexSyntaxError(f"bad class range {c}-{hi}")
                items.append(("range", c, hi))
            else:
                items.append(("ch", c))
        return (items, negated)


# ---------------------------------------------------------------------------
# emitter: fragment tree → flat program
# ---------------------------------------------------------------------------


class _Emitter:
    def __init__(self):
        # each instruction: (op, a, b)
        #   CHAR  pred          SPLIT x y     JMP x
        #   SAVE  slot          ASSERT kind multiline   MATCH
        self.prog: list[tuple] = []

    def _emit(self, op, a=None, b=None) -> int:
        if len(self.prog) >= MAX_PROGRAM:
            raise UnsupportedRegex("pattern compiles to too many instructions")
        self.prog.append((op, a, b))
        return len(self.prog) - 1

    def node(self, n) -> None:
        kind = n[0]
        if kind == "empty":
            return
        if kind == "lit":
            self._emit(CHAR, _lit_pred(n[1], n[2]))
        elif kind == "any":
            dotall = n[1]
            self._emit(CHAR, (lambda c: True) if dotall else (lambda c: c != "\n"))
        elif kind == "class":
            (items, negated) = n[1]
            self._emit(CHAR, _class_pred(items, negated, n[2]))
        elif kind == "assert":
            self._emit(ASSERT, n[1], n[2])
        elif kind == "cat":
            for part in n[1]:
                self.node(part)
        elif kind == "alt":
            self._alt(n[1])
        elif kind == "group":
            self._emit(SAVE, 2 * n[1])
            self.node(n[2])
            self._emit(SAVE, 2 * n[1] + 1)
        elif kind == "star":
            self._star(n[1], n[2])
        elif kind == "plus":
            start = len(self.prog)
            self.node(n[1])
            sp = self._emit(SPLIT, None, None)
            a, b = start, len(self.prog)
            self.prog[sp] = (SPLIT, b, a) if n[2] else (SPLIT, a, b)
        elif kind == "quest":
            sp = self._emit(SPLIT, None, None)
            self.node(n[1])
            a, b = sp + 1, len(self.prog)
            self.prog[sp] = (SPLIT, b, a) if n[2] else (SPLIT, a, b)
        elif kind == "rep":
            self._rep(n[1], n[2], n[3], n[4])
        else:  # pragma: no cover
            raise AssertionError(f"unknown node {kind}")

    def _alt(self, branches: list) -> None:
        jumps = []
        for i, br in enumerate(branches):
            last = i == len(branches) - 1
            if last:
                self.node(br)
            else:
                sp = self._emit(SPLIT, None, None)
                self.node(br)
                jumps.append(self._emit(JMP, None))
                self.prog[sp] = (SPLIT, sp + 1, len(self.prog))
        end = len(self.prog)
        for j in jumps:
            self.prog[j] = (JMP, end, None)

    def _star(self, inner, lazy: bool) -> None:
        sp = self._emit(SPLIT, None, None)
        self.node(inner)
        self._emit(JMP, sp)
        a, b = sp + 1, len(self.prog)
        self.prog[sp] = (SPLIT, b, a) if lazy else (SPLIT, a, b)

    def _rep(self, inner, lo: int, hi: int, lazy: bool) -> None:
        for _ in range(lo):
            self.node(inner)
        if hi == -1:
            self._star(inner, lazy)
        else:
            # (hi - lo) nested optionals: (x(x(x)?)?)?
            sps = []
            for _ in range(hi - lo):
                sps.append(self._emit(SPLIT, None, None))
                self.node(inner)
            end = len(self.prog)
            for sp in sps:
                self.prog[sp] = (SPLIT, end, sp + 1) if lazy else (SPLIT, sp + 1, end)


# ---------------------------------------------------------------------------
# the Pike VM
# ---------------------------------------------------------------------------


class Re2Match:
    __slots__ = ("_saves", "_ngroups", "subject")

    def __init__(self, saves: list, ngroups: int, subject: str):
        self._saves = saves
        self._ngroups = ngroups
        self.subject = subject

    def group(self, i: int = 0) -> Optional[str]:
        s, e = self._saves[2 * i], self._saves[2 * i + 1]
        if s is None or e is None:
            return None
        return self.subject[s:e]

    def groups(self) -> list:
        return [self.group(i) for i in range(1, self._ngroups + 1)]

    @property
    def start(self) -> int:
        return self._saves[0]

    @property
    def end(self) -> int:
        return self._saves[1]


class Re2:
    """A compiled linear-time pattern. API mirrors the slice of Go's
    ``*regexp.Regexp`` the Lua module binds."""

    def __init__(self, pattern: str):
        self.pattern = pattern
        parser = _Parser(pattern)
        tree = parser.parse(_Flags())
        self.ngroups = parser.ngroups
        em = _Emitter()
        em._emit(SAVE, 0)
        em.node(tree)
        em._emit(SAVE, 1)
        em._emit(MATCH)
        self.prog = em.prog
        self.nsaves = 2 * (self.ngroups + 1)

    # -- core VM -------------------------------------------------------------

    def _assert_ok(self, kind: str, multiline: bool, s: str, pos: int) -> bool:
        n = len(s)
        if kind == "^":
            return pos == 0 or (multiline and s[pos - 1] == "\n")
        if kind == "$":
            return pos == n or (multiline and s[pos] == "\n")
        if kind == "A":
            return pos == 0
        if kind == "z":
            return pos == n
        before = pos > 0 and (s[pos - 1] in _WORD or s[pos - 1].isalnum())
        after = pos < n and (s[pos] in _WORD or s[pos].isalnum())
        if kind == "b":
            return before != after
        return before == after  # 'B'

    def _add(self, lst, seen, pc: int, saves: list, s: str, pos: int) -> None:
        """Follow the eps-closure of pc, appending CHAR/MATCH threads to
        lst in priority order. `seen` dedupes by pc — the FIRST (highest
        priority) thread at a pc wins, which is what yields Go's
        leftmost-first semantics."""
        stack = [(pc, saves)]
        while stack:
            pc, saves = stack.pop()
            if pc in seen:
                continue
            seen.add(pc)
            op, a, b = self.prog[pc]
            if op == JMP:
                stack.append((a, saves))
            elif op == SPLIT:
                # push b first so a is processed first (LIFO) → a has
                # higher priority
                stack.append((b, saves))
                stack.append((a, saves))
                # NOTE: dedupe via `seen` keeps priority despite the
                # shared set because a's whole subtree is expanded
                # before b's (DFS order)
            elif op == SAVE:
                ns = saves.copy()
                ns[a] = pos
                stack.append((pc + 1, ns))
            elif op == ASSERT:
                if self._assert_ok(a, b, s, pos):
                    stack.append((pc + 1, saves))
            else:  # CHAR or MATCH
                lst.append((pc, saves))

    def search(self, s: str, start: int = 0) -> Optional[Re2Match]:
        """Leftmost match at or after `start` (unanchored), Go/Perl
        thread-priority semantics. O(prog × subject)."""
        prog = self.prog
        matched: Optional[list] = None
        clist: list = []
        seen: set = set()
        n = len(s)
        pos = start
        while True:
            if matched is None and pos <= n:
                # unanchored: seed a fresh lowest-priority start thread
                fresh = [None] * self.nsaves
                self._add(clist, seen, 0, fresh, s, pos)
            nlist: list = []
            nseen: set = set()
            for pc, saves in clist:
                op, a, _b = prog[pc]
                if op == CHAR:
                    if pos < n and a(s[pos]):
                        self._add(nlist, nseen, pc + 1, saves, s, pos + 1)
                else:  # MATCH
                    matched = saves
                    break  # cut lower-priority threads
            clist, seen = nlist, nseen
            pos += 1
            if pos > n and not clist:
                break
            if matched is not None and not clist:
                break
        if matched is None:
            return None
        return Re2Match(matched, self.ngroups, s)

    # -- Go-API-shaped helpers ------------------------------------------------

    def match(self, s: str) -> bool:
        return self.search(s) is not None

    def find(self, s: str) -> str:
        m = self.search(s)
        return m.group(0) if m else ""

    def find_submatch(self, s: str) -> Optional[list]:
        m = self.search(s)
        if m is None:
            return None
        return [m.group(0)] + [g if g is not None else "" for g in m.groups()]

    def finditer(self, s: str, limit: int = -1):
        # Go allMatches (regexp.go): an EMPTY match that starts exactly
        # where the previous match ended is skipped (not delivered) —
        # FindAllString("a*", "aa") is ["aa"], never ["aa", ""]. The
        # scan still advances one char past the suppressed match.
        pos = 0
        count = 0
        prev_match_end = -1
        while pos <= len(s):
            if limit >= 0 and count >= limit:
                return
            m = self.search(s, pos)
            if m is None:
                return
            accept = True
            if m.end == m.start:
                if m.start == prev_match_end:
                    accept = False
                pos = m.end + 1
            else:
                pos = m.end
            prev_match_end = m.end
            if accept:
                yield m
                count += 1

    def find_all(self, s: str, limit: int = -1) -> list[str]:
        # Go FindAllString: whole matches (never groups)
        return [m.group(0) for m in self.finditer(s, limit)]

    def find_all_submatch(self, s: str, limit: int = -1) -> list[list[str]]:
        return [
            [m.group(0)] + [g if g is not None else "" for g in m.groups()]
            for m in self.finditer(s, limit)
        ]


def compile(pattern: str) -> Re2:  # noqa: A001 — mirrors module convention
    return Re2(pattern)


def match(pattern: str, s: str) -> bool:
    return Re2(pattern).match(s)


def quote_meta(s: str) -> str:
    # Go regexp.QuoteMeta: backslash-escape RE2 specials
    out = []
    for c in s:
        if c in r"\.+*?()|[]{}^$":
            out.append("\\")
        out.append(c)
    return "".join(out)
