"""Deterministic synthetic Common-Crawl-style corpus + query set (FIXTURES.md).

Input table shape is authoritative from BASELINE.json input_hint:
  (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Everything is seeded (PCG64) and wall-clock-free so every run — oracle, Spark
build, resume test, scaling bench — sees byte-identical input. Zipf(s=1.07)
term frequencies deliberately create the head-term skew that the salted
index build (index/build.py) must handle.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from .textnorm import extract_text

SEED = 42
VOCAB_SIZE = 10_000
ZIPF_S = 1.07
LEN_MU, LEN_SIGMA = 5.0, 0.6
LEN_MIN, LEN_MAX = 8, 2048
EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

# 16 fixed "needle" phrases for phrase/span tests; ~1% of docs embed one.
NEEDLES: List[str] = [
    f"needle{chr(ord('a') + i)} marker{i} sentinel{i * 7 % 13}" for i in range(16)
]

SCALES = {"tiny": 500, "small": 20_000, "bench": 200_000}

_LANG_CYCLE = ["de", "fr", "zh"]


def vocab(size: int = VOCAB_SIZE) -> List[str]:
    """Deterministic vocabulary: wordNNNNN plus a few readable head words."""
    head = [
        "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
        "was", "on", "with", "as", "by", "at", "from", "are", "this", "be",
    ]
    out = list(head)
    i = 0
    while len(out) < size:
        out.append(f"word{i:05d}")
        i += 1
    return out[:size]


def _zipf_probs(size: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    w = ranks ** (-s)
    return w / w.sum()


@dataclass
class Page:
    url: str
    warc_ts: _dt.datetime
    html: bytes
    text: str
    lang: str


def _html_wrap(i: int, title: str, body: str) -> bytes:
    """Deterministic HTML template; every 7th doc gets nested tags/entities
    and a control char to exercise the extractor (FIXTURES.md §1)."""
    if i % 7 == 0:
        body_html = (
            f"<div><p>{body[: len(body) // 2]}&amp; extra</p>"
            f"<span>{body[len(body) // 2 :]}\x07</span></div>"
        )
    else:
        body_html = f"<p>{body}</p>"
    html = (
        f"<html><head><title>{title}</title>"
        f"<style>p {{color: red}}</style></head>"
        f"<body>{body_html}<script>skip();</script></body></html>"
    )
    return html.encode("utf-8")


def generate_pages(n_docs: int, seed: int = SEED) -> List[Page]:
    """Generate n_docs deterministic pages. text = extract_text(html) — the
    byte-identity invariant holds by construction and is re-verified in tests."""
    rng = np.random.Generator(np.random.PCG64(seed))
    words = vocab()
    probs = _zipf_probs(len(words))
    lengths = np.clip(
        np.exp(rng.normal(LEN_MU, LEN_SIGMA, size=n_docs)), LEN_MIN, LEN_MAX
    ).astype(np.int64)
    # one draw call for all tokens: fast and order-deterministic
    total = int(lengths.sum())
    draws = rng.choice(len(words), size=total, p=probs)
    needle_mask = rng.random(n_docs) < 0.01
    needle_idx = rng.integers(0, len(NEEDLES), size=n_docs)

    pages: List[Page] = []
    off = 0
    for i in range(n_docs):
        L = int(lengths[i])
        toks = [words[j] for j in draws[off : off + L]]
        off += L
        if needle_mask[i]:
            pos = i % max(1, L - 1)
            toks = toks[:pos] + NEEDLES[int(needle_idx[i])].split() + toks[pos:]
        body = " ".join(toks)
        s = i % 997
        url = f"https://site{s:04d}.example/p{i:08d}"
        title = f"Page {i}"
        html = _html_wrap(i, title, body)
        lang = "en" if i % 20 != 19 else _LANG_CYCLE[(i // 20) % 3]
        pages.append(
            Page(
                url=url,
                warc_ts=EPOCH + _dt.timedelta(seconds=i),
                html=html,
                text=extract_text(html),
                lang=lang,
            )
        )
    return pages


def pages_to_pandas(pages: List[Page]):
    import pandas as pd

    return pd.DataFrame(
        {
            "url": [p.url for p in pages],
            "warc_ts": [p.warc_ts for p in pages],
            "html": [p.html for p in pages],
            "text": [p.text for p in pages],
            "lang": [p.lang for p in pages],
        }
    )


def write_pages_parquet(
    path: str, n_docs: int, seed: int = SEED, row_group_size: int = 2000
) -> None:
    """Small row groups so Spark can split the file across tasks (a single
    row-group parquet is unsplittable -> serial scan)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pages_to_pandas(generate_pages(n_docs, seed))
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema),
        path,
        row_group_size=row_group_size,
    )


# ---------------------------------------------------------------------------
# Query set (FIXTURES.md §2): 100 queries — 40 single-term, 30 AND, 20 OR,
# 10 needle phrases.
# ---------------------------------------------------------------------------

@dataclass
class Query:
    query_id: str
    terms: List[str]
    mode: str  # "and" | "or" | "phrase"


def generate_queries(seed: int = SEED + 1) -> List[Query]:
    rng = np.random.Generator(np.random.PCG64(seed))
    words = vocab()
    probs = _zipf_probs(len(words))
    out: List[Query] = []
    i = 0
    for _ in range(40):
        t = words[int(rng.choice(len(words), p=probs))]
        out.append(Query(f"q{i:04d}", [t], "and"))
        i += 1
    for _ in range(30):
        k = int(rng.integers(2, 6))
        ts = [words[int(j)] for j in rng.choice(len(words), size=k, p=probs)]
        out.append(Query(f"q{i:04d}", ts, "and"))
        i += 1
    for _ in range(20):
        k = int(rng.integers(2, 6))
        ts = [words[int(j)] for j in rng.choice(len(words), size=k, p=probs)]
        out.append(Query(f"q{i:04d}", ts, "or"))
        i += 1
    for _ in range(10):
        phrase = NEEDLES[int(rng.integers(0, len(NEEDLES)))]
        out.append(Query(f"q{i:04d}", phrase.split(), "phrase"))
        i += 1
    return out
