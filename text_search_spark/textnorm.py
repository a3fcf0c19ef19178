"""Canonical text extraction + normalization kernels.

One definition, three renditions (pure Python, Spark Column expression,
DuckDB SQL string) so the engine, the NumPy oracle, and the DuckDB
correctness oracle tokenize *identically* — the byte-identity discipline the
reference enforces with its single shared cleaner
(/root/reference/examples/libriheavy/scripts/clean.py:8-19) and its ASCII-only
uppercase fold (/root/reference/textsearch/python/textsearch/datatypes.py:306-313).

Tokenizer contract (fixed; every component of the engine uses this):
  1. ASCII-only uppercase fold: bytes [a-z] -> [A-Z], nothing else
     (reference: datatypes.py:306-313 folds only codepoints 97..122).
  2. Every punctuation character in PUNCT_ALL is replaced by a space
     (reference char set: textsearch/python/textsearch/utils.py:12-17,
     copied verbatim — includes CJK punctuation).
  3. Split on runs of ASCII whitespace [ \\t\\n\\r\\f] and drop empties
     (explicit class, NOT \\s, so Java regex / RE2 / Python re agree).

Token position = 0-based index in the resulting token list (the provenance
`pos` column — the Spark analog of SourcedText.pos, datatypes.py:245-282).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List

# Verbatim from /root/reference/textsearch/python/textsearch/utils.py:12-17
# ("PUCTUATIONS" [sic] in the reference). '-' appears twice there; set() dedups.
PUNCT_ALL = "'.,;?!():-<>/\"。，；？！（）：-《》【】”“"
PUNCT_EOS = ".?,，!。？！"
PUNCT_LEFT = "\"'(<《【“"
PUNCT_RIGHT = "\"')>》】”"

# Deduplicated, deterministic order (first occurrence) — used by translate().
_PUNCT_CHARS = "".join(dict.fromkeys(PUNCT_ALL))
_PUNCT_TO_SPACE = str.maketrans({c: " " for c in _PUNCT_CHARS})

_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_FOLD = str.maketrans(_ASCII_LOWER, _ASCII_UPPER)

# Explicit ASCII whitespace class — identical semantics in Python re,
# Java regex (Spark) and RE2 (DuckDB). \v excluded on purpose (RE2's \s
# lacks it); the corpus generator never emits \v.
_WS_RE = re.compile(r"[ \t\n\r\f]+")
WS_CLASS = "[ \\t\\n\\r\\f]"


def ascii_upper(s: str) -> str:
    """ASCII-only uppercase fold (reference datatypes.py:306-313)."""
    return s.translate(_FOLD)


def normalize(s: str) -> str:
    """fold -> punct-to-space -> whitespace collapse + strip."""
    s = ascii_upper(s).translate(_PUNCT_TO_SPACE)
    return _WS_RE.sub(" ", s).strip(" \t\n\r\f")


def tokenize(s: str) -> List[str]:
    """Canonical tokenizer. Returns [] for empty/whitespace-only input."""
    n = normalize(s)
    return n.split(" ") if n else []


# ---------------------------------------------------------------------------
# HTML -> text extractor (stdlib reimplementation of the reference cleaner,
# /root/reference/examples/libriheavy/scripts/clean.py:8-19: BeautifulSoup
# get_text(separator=" ", strip=True) over text nodes, skipping
# script/style/template contents, then whitespace-collapse + rejoin).
# ---------------------------------------------------------------------------

_SKIP_CONTENT_TAGS = frozenset({"script", "style", "template"})
# Control chars (C0 except \t\n\r, plus DEL) -> removed, mirroring the
# reference's replace_control_char post-processing step (clean.py:14-18).
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")

# markup constructs that, left incomplete at EOF, are discarded per the
# HTML5 eof-in-comment / eof-in-tag / bogus-comment tokenizer rules:
# '<!', '<?', '</', or '<' + tag-name letter (a bare '<' is text)
_INCOMPLETE_MARKUP_RE = re.compile(r"<(?:!|\?|/|[a-zA-Z])")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: List[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0:
            stripped = data.strip()
            if stripped:
                self.chunks.append(stripped)


def extract_text(html: bytes | str) -> str:
    """HTML -> visible text, single-space separated, control chars removed.

    Must be byte-identical per url between the oracle and the Spark UDF
    (BASELINE.json input_hint) — both call exactly this function.
    """
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _TextExtractor()
    p.feed(html)
    # HTML5 end-of-file rules: a construct truncated at EOF — comment
    # ('<!--…'), bogus comment ('<!…', '<?…'), or tag ('<div cla',
    # '</p'…) — is discarded, never emitted as text; stdlib HTMLParser
    # instead re-emits the buffered tail as text on close(). Truncated
    # pages are common in web crawls. The parser's own buffer is the
    # context-aware signal: rawdata holds a markup prefix exactly when a
    # REAL construct was left incomplete — a '<!--' inside a script
    # string or an attribute value is consumed by feed() and never
    # buffered (string-level rfind heuristics get those wrong and leak
    # a spurious '-->' into the text). A bare trailing '<' is NOT a
    # construct (HTML5 emits it as text) and is kept.
    if _INCOMPLETE_MARKUP_RE.match(p.rawdata):
        p.rawdata = ""
    p.close()
    text = " ".join(p.chunks)
    text = _CTRL_RE.sub("", text)
    return " ".join(text.split())


# ---------------------------------------------------------------------------
# Spark Column expression rendition (JVM-side, whole-stage-codegen friendly —
# no Python UDF in the tokenize hot path).
# ---------------------------------------------------------------------------

def spark_normalize(col):
    """Spark Column: normalize(text). Mirrors normalize() exactly."""
    from pyspark.sql import functions as F

    spaces = " " * len(_PUNCT_CHARS)
    c = F.translate(col, _ASCII_LOWER, _ASCII_UPPER)
    c = F.translate(c, _PUNCT_CHARS, spaces)
    c = F.regexp_replace(c, WS_CLASS + "+", " ")
    return F.btrim(c, F.lit(" \t\n\r\f"))


def spark_tokens(col):
    """Spark Column: array<string> of tokens (empty array for blank text).

    NOT spark_normalize + split: splitting directly on runs of the
    whitespace class and dropping empty elements yields the identical
    token array (leading/trailing separators produce exactly the ""
    elements array_remove drops; a blank/empty input becomes all-""
    -> []) while skipping the collapse regexp_replace + btrim pass AND
    the empty-string CASE guard that referenced the whole normalize
    chain twice. Measured 0.62-0.73 -> 0.44-0.46 s for the 50k-doc
    tokenize+explode at local[32], token-array equality verified over
    the full corpus (round-8). array_remove is a codegen'd JVM
    expression (no per-element lambda)."""
    from pyspark.sql import functions as F

    spaces = " " * len(_PUNCT_CHARS)
    c = F.translate(col, _ASCII_LOWER, _ASCII_UPPER)
    c = F.translate(c, _PUNCT_CHARS, spaces)
    return F.array_remove(F.split(c, WS_CLASS + "+", -1), "")


# ---------------------------------------------------------------------------
# DuckDB SQL rendition (string templates for oracle_sql()).
# ---------------------------------------------------------------------------

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def duckdb_normalize_sql(col: str) -> str:
    """DuckDB SQL expression equivalent of normalize(col)."""
    spaces = " " * len(_PUNCT_CHARS)
    fold = f"translate({col}, {_sql_quote(_ASCII_LOWER)}, {_sql_quote(_ASCII_UPPER)})"
    punct = f"translate({fold}, {_sql_quote(_PUNCT_CHARS)}, {_sql_quote(spaces)})"
    collapsed = f"regexp_replace({punct}, '[ \\t\\n\\r\\f]+', ' ', 'g')"
    return f"trim({collapsed}, ' ' || chr(9) || chr(10) || chr(13) || chr(12))"


def duckdb_tokens_sql(col: str) -> str:
    """DuckDB SQL expression: LIST of tokens (empty list for blank text)."""
    n = duckdb_normalize_sql(col)
    return f"(CASE WHEN {n} = '' THEN []::VARCHAR[] ELSE string_split({n}, ' ') END)"
