"""AQL parser — the reference's script language re-parsed in Python.

Grammar per aql/parser.go:146-158 (11 block types) and aql/lexer.go's
two-phase approach: the outer scan tracks quotes and paren depth so
block bodies are opaque PAREN_BODY text, re-parsed only where the
grammar needs it (WITH options, transform bodies).

Supported surface (matches the reference's tests/examples):

  CONNECTION 'name' ( k = 'v', ... )
  QUERY 'name' FROM <source> ( body ) [USING PARAMETER @a, @b]
        [INTO <sink> [WITH (...)]] [AFTER a, b]
  EXEC 'name' FROM <source> ( body ) [AFTER ...]
  DATA 'name' [EXTERN 'file'] [( body )] [INTO <sink>] [WITH (...)]
  TRANSFORM [PLUGIN] 'name' FROM <srcs> ( body ) [INTO <sink>]
        [WITH (...)] [AFTER ...]
  GLOBAL 'name' ( body )
  DECLARE @P [, @Q] ;
  SET k = 'v' ;
  INCLUDE 'file' ;
  TEST block WITH ASSERTIONS ( ... )

sources: GLOBAL | CONNECTION name | BLOCK a [, BLOCK b] [AS alias]
sinks:   CONSOLE | GLOBAL | PARAMETER (@p, ...) | CONNECTION name

Comments: ``--`` line and ``/** **/`` block (aql/lexer.go:311-333).
Keywords case-insensitive. Go-template ``{{ .Opt }}`` interpolation
(aql/parser.go:689-715) as a restricted-variable substitution.
INCLUDE/EXTERN file inlining with max depth 8 (aql/parser.go:19-20).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

MAX_INCLUDE_DEPTH = 8

_BLOCK_KEYWORDS = (
    "CONNECTION",
    "QUERY",
    "EXEC",
    "DATA",
    "TRANSFORM",
    "GLOBAL",
    "DECLARE",
    "SET",
    "INCLUDE",
    "TEST",
    "DESCRIPTION",
)


@dataclass
class SourceRef:
    kind: str  # 'global' | 'connection' | 'block'
    name: str | None = None
    alias: str | None = None


@dataclass
class SinkRef:
    kind: str  # 'console' | 'global' | 'parameter' | 'connection' | 'block'
    name: str | None = None
    params: list[str] = field(default_factory=list)


@dataclass
class Block:
    kind: str
    name: str | None = None
    sources: list[SourceRef] = field(default_factory=list)
    body: str | None = None
    sinks: list[SinkRef] = field(default_factory=list)
    options: dict[str, object] = field(default_factory=dict)
    after: list[str] = field(default_factory=list)
    using_params: list[str] = field(default_factory=list)
    plugin: bool = False
    extern: str | None = None
    # SET
    key: str | None = None
    value: object = None
    # DECLARE
    declares: list[str] = field(default_factory=list)
    # TEST
    assertions_body: str | None = None


def strip_comments(text: str) -> str:
    out = []
    i, n = 0, len(text)
    in_quote = False
    while i < n:
        ch = text[i]
        if in_quote:
            out.append(ch)
            if ch == "'":
                in_quote = False
            i += 1
            continue
        if ch == "'":
            in_quote = True
            out.append(ch)
            i += 1
            continue
        if text.startswith("--", i):
            j = text.find("\n", i)
            i = n if j < 0 else j
            continue
        if text.startswith("/**", i):
            j = text.find("**/", i + 3)
            if j < 0:
                raise SyntaxError("unterminated /** **/ comment")
            i = j + 3
            continue
        out.append(ch)
        i += 1
    return "".join(out)


class _Scanner:
    """Token scanner that treats quoted strings and balanced paren
    groups as single units (the lexer's PAREN_BODY behavior)."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def skip_ws(self):
        while self.pos < len(self.text) and self.text[self.pos] in " \t\r\n;":
            self.pos += 1

    def peek_word(self) -> str | None:
        save = self.pos
        w = self.next_word()
        self.pos = save
        return w

    def next_word(self) -> str | None:
        self.skip_ws()
        m = re.match(r"[A-Za-z_@][\w@.]*", self.text[self.pos:])
        if not m:
            return None
        self.pos += m.end()
        return m.group(0)

    def next_quoted(self) -> str:
        # The reference lexer only tokenizes '...' (lexer.go:188-200),
        # but its DOCS use "..." option values (intro.md:15) and
        # backtick INCLUDE paths (blocks.md:56) — accept all three as
        # a harmless superset so every documented script parses.
        self.skip_ws()
        if self.pos >= len(self.text) or self.text[self.pos] not in "'\"`":
            raise SyntaxError(f"expected quoted string at {self.text[self.pos:self.pos+40]!r}")
        q = self.text[self.pos]
        j = self.pos + 1
        buf = []
        while j < len(self.text):
            if self.text[j] == q:
                if q == "'" and j + 1 < len(self.text) and self.text[j + 1] == q:
                    buf.append(q)
                    j += 2
                    continue
                self.pos = j + 1
                return "".join(buf)
            buf.append(self.text[j])
            j += 1
        raise SyntaxError("unterminated string literal")

    def next_paren_body(self) -> str:
        self.skip_ws()
        if self.pos >= len(self.text) or self.text[self.pos] != "(":
            raise SyntaxError(
                f"expected '(' at {self.text[self.pos:self.pos+40]!r}"
            )
        depth = 0
        in_quote = False
        start = self.pos + 1
        for j in range(self.pos, len(self.text)):
            ch = self.text[j]
            if in_quote:
                if ch == "'":
                    in_quote = False
                continue
            if ch == "'":
                in_quote = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    self.pos = j + 1
                    return self.text[start:j]
        raise SyntaxError("unbalanced parentheses")

    def try_consume(self, word: str) -> bool:
        save = self.pos
        w = self.next_word()
        if w is not None and w.upper() == word.upper():
            return True
        self.pos = save
        return False

    def try_char(self, ch: str) -> bool:
        self.skip_ws()
        if self.pos < len(self.text) and self.text[self.pos] == ch:
            self.pos += 1
            return True
        return False

    def at_end(self) -> bool:
        self.skip_ws()
        return self.pos >= len(self.text)


_NUM_RE = re.compile(r"^-?\d+(\.\d+)?$")


def parse_options(body: str) -> dict[str, object]:
    """WITH (k = 'v', n = 1) option lists; numbers become numbers
    (aql/parser.go option scanning + truthiness)."""
    opts: dict[str, object] = {}
    sc = _Scanner(body)
    while not sc.at_end():
        key = sc.next_word()
        if key is None:
            raise SyntaxError(f"bad option list near {body[sc.pos:sc.pos+30]!r}")
        if not sc.try_char("="):
            raise SyntaxError(f"expected '=' after option {key}")
        sc.skip_ws()
        if sc.pos < len(sc.text) and sc.text[sc.pos] in "'\"`":
            val: object = sc.next_quoted()
        else:
            m = re.match(r"-?\d+(\.\d+)?", sc.text[sc.pos:])
            if not m:
                raise SyntaxError(f"bad option value for {key}")
            raw = m.group(0)
            val = float(raw) if "." in raw else int(raw)
            sc.pos += m.end()
        opts[key.upper()] = val
        sc.try_char(",")
    return opts


def truthy(v: object) -> bool:
    """Option truthiness, exactly the reference's rule
    (aql/parser.go:357-377): non-zero numbers are truthy,
    case-insensitive 'TRUE' strings are truthy, everything else —
    including '1', 'yes', None — is falsy."""
    if v is None:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0
    return str(v).strip().upper() == "TRUE"


_MISSING = object()


def find_option(options: dict[str, object], needle: str) -> object:
    """Case-insensitive option lookup (aql/parser.go:556-567
    FindOption); returns _MISSING when absent."""
    n = needle.lower()
    for k, v in options.items():
        if k.lower() == n:
            return v
    return _MISSING


def find_overridable_option(
    needle: str, namespace: str, *hierarchy: dict[str, object]
) -> tuple[object, bool]:
    """Search the option hierarchy in the order given, at each level
    trying the destination-specific ``{NAMESPACE}_{OPT}`` key before
    the generic key (aql/parser.go:558-587 FindOverridableOption).
    Returns (value, found)."""
    for opts in hierarchy:
        if not opts:
            continue
        if namespace:
            v = find_option(opts, f"{namespace}_{needle}")
            if v is not _MISSING:
                return v, True
        v = find_option(opts, needle)
        if v is not _MISSING:
            return v, True
    return None, False


def _parse_source(sc: _Scanner) -> SourceRef:
    w = sc.next_word()
    if w is None:
        raise SyntaxError("expected source after FROM")
    wu = w.upper()
    if wu == "GLOBAL":
        ref = SourceRef("global")
    elif wu == "CONNECTION":
        ref = SourceRef("connection", sc.next_word() or sc.next_quoted())
    elif wu == "BLOCK":
        ref = SourceRef("block", sc.next_word())
    elif wu == "PLUGIN":
        raise SyntaxError("PLUGIN belongs to TRANSFORM header")
    else:
        # bare name == block reference (TEST blocks use it)
        ref = SourceRef("block", w)
    if sc.try_consume("AS"):
        # aliases may be bare words or quoted (parser_test.go:412
        # `FROM GLOBAL AS 'source'`)
        ref.alias = sc.next_word() or sc.next_quoted()
    return ref


def _parse_sources(sc: _Scanner) -> list[SourceRef]:
    refs = [_parse_source(sc)]
    while sc.try_char(","):
        refs.append(_parse_source(sc))
    return refs


def _parse_sink(sc: _Scanner) -> SinkRef:
    w = sc.next_word()
    if w is None:
        raise SyntaxError("expected sink after INTO")
    wu = w.upper()
    if wu == "CONSOLE":
        return SinkRef("console")
    if wu == "GLOBAL":
        return SinkRef("global")
    if wu == "PARAMETER":
        body = sc.next_paren_body()
        params = [p.strip() for p in body.split(",") if p.strip()]
        return SinkRef("parameter", params=params)
    if wu == "CONNECTION":
        return SinkRef("connection", sc.next_word() or sc.next_quoted())
    if wu == "BLOCK":
        return SinkRef("block", sc.next_word())
    raise SyntaxError(f"unknown sink {w!r}")


def _parse_tail(sc: _Scanner, blk: Block):
    """INTO / WITH / AFTER / USING PARAMETER tail clauses, any order
    the reference's tests use."""
    while True:
        if sc.try_consume("USING"):
            if not sc.try_consume("PARAMETER"):
                raise SyntaxError("expected PARAMETER after USING")
            blk.using_params.append(sc.next_word())
            while sc.try_char(","):
                blk.using_params.append(sc.next_word())
        elif sc.try_consume("INTO"):
            # comma list: INTO CONNECTION d, GLOBAL (parser_test.go:375)
            blk.sinks.append(_parse_sink(sc))
            while sc.try_char(","):
                blk.sinks.append(_parse_sink(sc))
        elif sc.try_consume("WITH"):
            blk.options.update(parse_options(sc.next_paren_body()))
        elif sc.try_consume("AFTER"):
            blk.after.append(sc.next_word())
            while sc.try_char(","):
                blk.after.append(sc.next_word())
        else:
            return


def parse_script(
    text: str,
    script_dir: str = ".",
    options: dict[str, object] | None = None,
    _depth: int = 0,
) -> list[Block]:
    if _depth > MAX_INCLUDE_DEPTH:
        raise SyntaxError("INCLUDE depth exceeds 8")
    text = strip_comments(text)
    sc = _Scanner(text)
    blocks: list[Block] = []
    while not sc.at_end():
        kw = sc.next_word()
        if kw is None:
            raise SyntaxError(f"expected block keyword near {text[sc.pos:sc.pos+40]!r}")
        kwu = kw.upper()
        if kwu not in _BLOCK_KEYWORDS:
            raise SyntaxError(f"unknown block keyword {kw!r}")
        if kwu == "SET":
            key = sc.next_word()
            if not sc.try_char("="):
                raise SyntaxError("expected '=' in SET")
            sc.skip_ws()
            if sc.pos < len(sc.text) and sc.text[sc.pos] in "'\"`":
                val = sc.next_quoted()
            else:
                m = re.match(r"-?\d+(\.\d+)?", sc.text[sc.pos:])
                if m is None:
                    raise SyntaxError(
                        f"expected SET value near {sc.text[sc.pos:sc.pos+30]!r}"
                    )
                val = m.group(0)
                sc.pos += m.end()
            blocks.append(Block("set", key=key.upper(), value=val))
            continue
        if kwu == "DESCRIPTION":
            # DESCRIPTION 'free text' — documentation block, no
            # execution semantics (parser_test.go:536-552)
            blk = Block("description")
            blk.body = sc.next_quoted()
            blocks.append(blk)
            continue
        if kwu == "DECLARE":
            blk = Block("declare")

            def _declare_name() -> str:
                # grammar is DECLARE @IDENT (aql/parser.go:93), but
                # blocks.md:33 documents DECLARE 'NAME' — accept both
                sc.skip_ws()
                if sc.pos < len(sc.text) and sc.text[sc.pos] in "'\"`":
                    return sc.next_quoted()
                w = sc.next_word()
                if w is None:
                    raise SyntaxError("expected parameter name after DECLARE")
                return w

            blk.declares.append(_declare_name())
            while sc.try_char(","):
                blk.declares.append(_declare_name())
            blocks.append(blk)
            continue
        if kwu == "INCLUDE":
            path = sc.next_quoted()
            if options:
                # parametrized include paths: INCLUDE '{{ .Source }}.txt'
                # (parser_test.go:443-456 EvaluateParametrizedExtern)
                path = render_templates(path, options)
            inc = open(os.path.join(script_dir, path)).read()
            blocks.extend(
                parse_script(inc, script_dir, options, _depth + 1)
            )
            continue
        if kwu == "TEST":
            blk = Block("test")
            blk.sources = [_parse_source(sc)]
            if not (sc.try_consume("WITH") and sc.try_consume("ASSERTIONS")):
                raise SyntaxError("expected WITH ASSERTIONS in TEST block")
            blk.assertions_body = sc.next_paren_body()
            blocks.append(blk)
            continue

        blk = Block(kwu.lower())
        if kwu == "TRANSFORM" and sc.try_consume("PLUGIN"):
            blk.plugin = True
        blk.name = sc.next_quoted()
        if sc.try_consume("EXTERN"):
            blk.extern = sc.next_quoted()
        if kwu in ("QUERY", "EXEC", "TRANSFORM"):
            if sc.try_consume("FROM"):
                blk.sources = _parse_sources(sc)
        sc.skip_ws()
        if sc.pos < len(sc.text) and sc.text[sc.pos] == "(":
            blk.body = sc.next_paren_body()
            if kwu == "CONNECTION":
                # a CONNECTION's paren body IS its option list
                # (aql grammar: CONNECTION 'name' (k = 'v', ...))
                blk.options.update(parse_options(blk.body))
        if blk.extern:
            blk.body = open(os.path.join(script_dir, blk.extern)).read()
        _parse_tail(sc, blk)
        blocks.append(blk)

    if options:
        blocks = [_apply_templates(b, options) for b in blocks]
    return blocks


_TEMPLATE_RE = re.compile(r"\{\{\s*\.(\w+)\s*\}\}")


def render_templates(text: str, options: dict[str, object]) -> str:
    """Go-template variable subset: {{ .Name }} (aql/parser.go:689-715).
    Unknown variables raise, as text/template's missingkey=error."""
    lower = {k.lower(): v for k, v in options.items()}

    def sub(m):
        key = m.group(1).lower()
        if key not in lower:
            raise KeyError(f"template variable {m.group(1)!r} not set")
        return str(lower[key])

    return _TEMPLATE_RE.sub(sub, text)


def _apply_templates(blk: Block, options: dict[str, object]) -> Block:
    if blk.body:
        blk.body = render_templates(blk.body, options)
    if blk.assertions_body:
        blk.assertions_body = render_templates(blk.assertions_body, options)
    return blk
