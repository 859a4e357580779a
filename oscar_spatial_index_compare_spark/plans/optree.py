"""Op-tree query language parser (SURVEY §2.4, Q1-Q9).

Reference: liboscar's ``AdvancedOpTree`` (parsed in
``src/static-htm-index.cpp:210-213``).  Grammar reproduced here:

    expr   := term  (('+' | '-' | '^') term)*          (union/diff/symdiff)
    term   := factor (('/' factor) | factor)*          (intersection; bare
                                                        adjacency == '/')
    factor := '!' factor | '%' factor | '(' expr ')' | leaf
    leaf   := token            exact        ("join")
            | token '*'        prefix       ("jo*")
            | '*' token        suffix       ("*in")
            | '*' token '*'    substring    ("*oi*")
            | '$region:' id    region leaf  (Q3)
            | '$cell:' id      grid-cell leaf (Q3)
            | '$poly:' name    polygon leaf (X1; reference stubs these — Q9)
            | '$rect:' a,b,c,d bounding-box leaf lat0,lat1,lon0,lon1
                               (reference RECT leaf, stubbed —
                               ``src/OscarSearchWithSg.cpp:142-158``)

'!' is FM_CONVERSION (reference spells it '*',
``src/OscarSearchWithSg.cpp:165``; renamed here because '*' is taken by the
prefix/suffix markers that the reference handles in its trie normalizer).
'%' is one-ring CELL_DILATION (reference enumerates the op but stubs it,
``src/OscarSearchWithSg.cpp:167-181``): every cell neighboring a result
cell joins the result as a full-match cell.

Note: a `$rect:` leaf may contain negative coordinates; the '-' characters
are part of the leaf only INSIDE a `$...:` payload (no spaces), so a
difference operator directly after a $-leaf needs surrounding spaces
('$region:1 - 2', not '$region:1-2').  Plain token leaves are unaffected:
'-' is not in their charset, so 'a-b' still lexes as a difference.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class Node:
    op: str  # union|inter|diff|sym|fm|dilate|token|region|cell|poly|rect
    args: tuple = ()

    def __repr__(self):  # compact for test output
        return f"({self.op} {' '.join(map(repr, self.args))})"


# '-' is NOT in the token charset: 'a-b' must lex as the difference operator
# (ADVICE r01 — with '-' included it silently became one leaf token)
_TOKEN_RE = re.compile(r"[\w.$:*]+", re.UNICODE)
# $-leaves carry structured payloads (e.g. $rect: with signed coordinates)
# — inside them ',' and '-' belong to the leaf, never to the operator set
_DOLLAR_RE = re.compile(r"\$[\w.:,*+\-]+", re.UNICODE)


def _lex(s: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c.isspace():
            i += 1
            continue
        if c == "$":
            m = _DOLLAR_RE.match(s, i)
            if m is None:
                raise ValueError(
                    f"bad $-leaf at {i} in {s!r}: expected $region:/$cell:/"
                    f"$poly:/$rect: with a payload"
                )
            out.append(m.group(0))
            i = m.end()
            continue
        if c in "()+-^/!%":
            out.append(c)
            i += 1
            continue
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ValueError(f"bad character {c!r} at {i} in {s!r}")
        out.append(m.group(0))
        i = m.end()
    return out


_BINOPS = {"+": "union", "-": "diff", "^": "sym"}


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> Node:
        n = self.expr()
        if self.peek() is not None:
            raise ValueError(f"trailing input at {self.toks[self.i:]}")
        return n

    def expr(self) -> Node:
        n = self.term()
        while self.peek() in _BINOPS:
            op = self.next()
            n = Node(_BINOPS[op], (n, self.term()))
        return n

    def term(self) -> Node:
        n = self.factor()
        while True:
            p = self.peek()
            if p == "/":
                self.next()
                n = Node("inter", (n, self.factor()))
            elif p is not None and p not in _BINOPS and p not in (")",):
                n = Node("inter", (n, self.factor()))  # bare adjacency
            else:
                return n

    def factor(self) -> Node:
        p = self.peek()
        if p == "!":
            self.next()
            return Node("fm", (self.factor(),))
        if p == "%":
            self.next()
            return Node("dilate", (self.factor(),))
        if p == "(":
            self.next()
            n = self.expr()
            if self.next() != ")":
                raise ValueError("expected )")
            return n
        return self.leaf()

    def leaf(self) -> Node:
        t = self.next()
        if t is None:
            raise ValueError("unexpected end of input")
        if t.startswith("$region:"):
            payload = t[len("$region:"):]
            if not re.fullmatch(r"\d+", payload):
                raise ValueError(
                    f"$region: needs a plain integer id — got {t!r}"
                    " (a '-' inside a $-leaf belongs to the leaf; write"
                    " '$region:1 - 2' for a difference)"
                )
            return Node("region", (int(payload),))
        if t.startswith("$cell:"):
            payload = t[len("$cell:"):]
            if not re.fullmatch(r"-?\d+", payload):
                raise ValueError(f"$cell: needs an integer cell id — got {t!r}")
            return Node("cell", (int(payload),))
        if t.startswith("$poly:"):
            return Node("poly", (t[len("$poly:"):],))
        if t.startswith("$rect:"):
            parts = t[len("$rect:"):].split(",")
            if len(parts) != 4:
                raise ValueError(f"$rect: needs lat0,lat1,lon0,lon1 — got {t!r}")
            try:
                coords = tuple(float(x) for x in parts)
            except ValueError:
                raise ValueError(
                    f"$rect: needs 4 numeric coords lat0,lat1,lon0,lon1 — got {t!r}"
                ) from None
            return Node("rect", coords)
        if t.startswith("$"):
            raise ValueError(
                f"unknown $-leaf {t!r}: expected $region:/$cell:/$poly:/$rect:"
            )
        qt = "exact"
        pat = t
        if pat.startswith("*") and pat.endswith("*") and len(pat) > 2:
            qt, pat = "substring", pat[1:-1]
        elif pat.endswith("*") and len(pat) > 1:
            qt, pat = "prefix", pat[:-1]
        elif pat.startswith("*") and len(pat) > 1:
            qt, pat = "suffix", pat[1:]
        return Node("token", (pat, qt))


def parse(query: str) -> Node:
    return _Parser(_lex(query)).parse()
