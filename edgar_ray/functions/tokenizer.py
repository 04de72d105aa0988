"""A pull-based HTML tokenizer faithful to golang.org/x/net/html's Tokenizer.

The reference engine walks EDGAR pages with Go's html.Tokenizer
(/root/reference/parser.go:38,56,328; /root/reference/reportmap.go:120).
Byte-identical extraction (BASELINE.json input_hint) requires replicating its
observable semantics exactly:

- tag names lowercased; attributes as an ordered (key, value) list with
  entity-unescaped values;
- text tokens entity-unescaped with \r\n -> \n newline conversion;
- <script>/<style>/<title>/<textarea> content emitted as a single raw-text
  token;
- comments / doctypes / processing instructions emitted as non-element tokens
  (the reference walkers skip them via z.Next());
- a zero token (ERROR type) before the first Next() call, and ERROR forever
  after end-of-input.

The tokenizer is regex-based over the whole page string (fast path for
map_batches); the token list is walked by TokenWalker, which mimics the
z.Next()/z.Token() cursor the reference's parse functions share across calls.
"""

from __future__ import annotations

import html as _htmlmod
import re

# Token types (values mirror the roles of go's html.TokenType where it matters:
# ERROR is falsy-adjacent and distinct from START/END/SELF).
ERROR = 0
TEXT = 1
START = 2
END = 3
SELF = 4  # self-closing tag: neither START nor END (go: SelfClosingTagToken)
COMMENT = 5
DOCTYPE = 6

ZERO_TOKEN = (ERROR, "", ())

_RAW_TEXT_TAGS = frozenset(("script", "style", "title", "textarea"))

_TAG_NAME_RE = re.compile(r"[a-zA-Z][^\s/>]*")
_ATTR_RE = re.compile(
    r"""\s*([^\s/=>]+)(?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)
_CRLF_RE = re.compile(r"\r\n?")


def _convert_newlines(s: str) -> str:
    return _CRLF_RE.sub("\n", s) if "\r" in s else s


def _unescape(s: str) -> str:
    return _htmlmod.unescape(s) if "&" in s else s


def tokenize(page: str | bytes) -> list[tuple]:
    """Tokenize an HTML page into [(type, data, attrs), ...].

    data: lowercased tag name for START/END/SELF, unescaped text for TEXT.
    attrs: tuple of (lowercased key, unescaped value) preserving source order.
    Adjacent text runs are merged into one token (go emits one text token per
    run between tags).
    """
    if isinstance(page, bytes):
        try:
            s = page.decode("utf-8")
        except UnicodeDecodeError:
            s = page.decode("latin-1")
    else:
        s = page

    toks: list[tuple] = []
    text_parts: list[str] = []
    n = len(s)
    i = 0

    def flush_text() -> None:
        if text_parts:
            txt = "".join(text_parts)
            text_parts.clear()
            if txt:
                toks.append((TEXT, _unescape(_convert_newlines(txt)), ()))

    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            text_parts.append(s[i:])
            break
        if lt > i:
            text_parts.append(s[i:lt])
        # Decide what kind of markup starts at lt.
        j = lt + 1
        if j >= n:
            text_parts.append(s[lt:])
            break
        c = s[j]
        if c == "!":
            flush_text()
            if s.startswith("<!--", lt):
                end = s.find("-->", lt + 4)
                if end < 0:
                    toks.append((COMMENT, s[lt + 4 :], ()))
                    break
                toks.append((COMMENT, s[lt + 4 : end], ()))
                i = end + 3
            else:
                end = s.find(">", j)
                if end < 0:
                    toks.append((DOCTYPE, s[j + 1 :], ()))
                    break
                toks.append((DOCTYPE, s[j + 1 : end], ()))
                i = end + 1
            continue
        if c == "?":
            flush_text()
            end = s.find(">", j)
            if end < 0:
                toks.append((COMMENT, s[j:], ()))
                break
            toks.append((COMMENT, s[j:end], ()))
            i = end + 1
            continue
        closing = c == "/"
        if closing:
            j += 1
        m = _TAG_NAME_RE.match(s, j)
        if m is None:
            # '<' not followed by a tag start: go treats it as text.
            text_parts.append("<")
            i = lt + 1
            continue
        flush_text()
        name = m.group().lower()
        j = m.end()
        if closing:
            end = s.find(">", j)
            if end < 0:
                break
            toks.append((END, name, ()))
            i = end + 1
            continue
        # Start tag: parse attributes until '>'.
        attrs: list[tuple[str, str]] = []
        self_closing = False
        while j < n:
            while j < n and s[j] in " \t\r\n\f":
                j += 1
            if j < n and s[j] == ">":
                j += 1
                break
            if j < n and s[j] == "/":
                k = j + 1
                while k < n and s[k] in " \t\r\n\f":
                    k += 1
                if k < n and s[k] == ">":
                    self_closing = True
                    j = k + 1
                    break
                j += 1
                continue
            am = _ATTR_RE.match(s, j)
            if am is None or am.end() == j:
                j += 1
                continue
            key = am.group(1).lower()
            val = am.group(2)
            if val is None:
                val = ""
            elif val[:1] in ("'", '"'):
                val = val[1:-1]
            attrs.append((key, _unescape(_convert_newlines(val))))
            j = am.end()
        toks.append((SELF if self_closing else START, name, tuple(attrs)))
        i = j
        if not self_closing and name in _RAW_TEXT_TAGS:
            # Raw-text element: everything until the matching close tag is one
            # text token.
            close_re = re.compile(r"</" + re.escape(name) + r"[\s>/]", re.I)
            cm = close_re.search(s, i)
            if cm is None:
                raw = s[i:]
                i = n
            else:
                raw = s[i : cm.start()]
                i = cm.start()
            if raw:
                toks.append((TEXT, _unescape(_convert_newlines(raw)), ()))
    flush_text()
    return toks


class TokenWalker:
    """Cursor over a token list mimicking go's z.Next()/z.Token() pair.

    The reference's parse functions share one tokenizer and leave the cursor
    mid-stream between calls (/root/reference/parser.go:326-345); TokenWalker
    preserves that: token() returns the current token (the zero token before
    the first next()), next() advances and returns the new token's type, or
    ERROR forever once input is exhausted.
    """

    __slots__ = ("toks", "i", "n")

    def __init__(self, tokens_or_page):
        if isinstance(tokens_or_page, (str, bytes)):
            self.toks = tokenize(tokens_or_page)
        else:
            self.toks = tokens_or_page
        self.i = -1
        self.n = len(self.toks)

    def next(self) -> int:
        if self.i < self.n:
            self.i += 1
        if self.i >= self.n:
            return ERROR
        return self.toks[self.i][0]

    def token(self) -> tuple:
        if 0 <= self.i < self.n:
            return self.toks[self.i]
        return ZERO_TOKEN

    def at_end(self) -> bool:
        return self.i >= self.n
