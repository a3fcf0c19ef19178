"""Offline trainer for the char-trigram language-ID scorer.

Trains a multinomial naive-Bayes model over character trigrams of the
multilingual fixture (tests/data/langid_fixture.json, train split = the
first TRAIN_PER sentences per language) and writes DETERMINISTIC integer
weights to text_search_spark/data/langid_weights.json. The fastText-style
public recipe (char n-gram features -> linear scorer, Joulin et al. 2016,
arXiv:1607.01759) with the feature-hashing layer replaced by an explicit
top-K trigram vocabulary so the scorer is replayable verbatim in SQL
(a hashed bucket table would need a SQL-side xxhash the oracle engine
lacks; at web-scale vocab the hashing layer is the drop-in seam).

Determinism: vocabulary = top VOCAB_PER_LANG features per language by
(count desc, trigram asc); weights = round(SCALE * log-likelihood with
add-1 smoothing). Integer weights make cross-engine score sums exact
(no float summation-order hazards in the argmax).

Run: python scripts/train_langid.py   (rewrites the weights file; the
checked-in file must equal the output — pinned by tests/test_langid.py)
"""

from __future__ import annotations

import json
import math
import os
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(ROOT, "tests", "data", "langid_fixture.json")
OUT = os.path.join(
    ROOT, "text_search_spark", "data", "langid_weights.json"
)

TRAIN_PER = 24          # first N sentences per language train; rest eval
VOCAB_PER_LANG = 80     # top trigrams per language kept in the vocab
SCALE = 1000            # integer weight = round(SCALE * log P(tri|lang))
NGRAM_ORDER = ["en", "de", "fr", "es", "zh"]  # argmax tie-break order


def features(s: str) -> list[str]:
    """Char features of lower(s): every unigram substring(t, i, 1) plus
    every trigram substring(t, i, 3) — EXACTLY the definition both the
    Spark operator and the DuckDB oracle use. Unigrams carry the
    languages whose single characters are discriminative (CJK function
    characters, accented Latin letters); trigrams carry morphology."""
    t = s.lower()
    return list(t) + [t[i : i + 3] for i in range(len(t) - 2)]


def train() -> dict:
    with open(FIXTURE) as f:
        fx = json.load(f)
    counts: dict[str, Counter] = {}
    for lang in NGRAM_ORDER:
        c = Counter()
        for sent in fx[lang][:TRAIN_PER]:
            c.update(features(sent))
        counts[lang] = c

    vocab: set[str] = set()
    for lang in NGRAM_ORDER:
        top = sorted(counts[lang].items(), key=lambda kv: (-kv[1], kv[0]))
        vocab.update(t for t, _ in top[:VOCAB_PER_LANG])
    vlist = sorted(vocab)

    weights: dict[str, list[int]] = {}
    v = len(vlist)
    totals = {
        lang: sum(counts[lang][t] for t in vlist) for lang in NGRAM_ORDER
    }
    for tri in vlist:
        row = []
        for lang in NGRAM_ORDER:
            p = (counts[lang][tri] + 1) / (totals[lang] + v)
            row.append(round(SCALE * math.log(p)))
        weights[tri] = row
    return {
        "langs": NGRAM_ORDER,
        "train_per": TRAIN_PER,
        "vocab_per_lang": VOCAB_PER_LANG,
        "scale": SCALE,
        "weights": weights,
    }


if __name__ == "__main__":
    model = train()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(model, f, ensure_ascii=False, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(model['weights'])} trigrams x "
          f"{len(model['langs'])} langs")
