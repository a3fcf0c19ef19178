"""Transcript ingestion (S2) vs the reference's own test vector
(/root/reference/textsearch/python/tests/test_transcript.py): tokens
"▁I ▁saw ▁a ▁girl ▁with ▁a ▁ te le s c o pe" with begin times i*0.25;
every char of token i carries time i*0.25; text round-trips."""

import pytest

from text_search_spark.operators.transcripts import transcripts_from_tokens

TOKENS = "▁I ▁saw ▁a ▁girl ▁with ▁a ▁ te le s c o pe".split()
TIMES = [i * 0.25 for i in range(len(TOKENS))]


def _expected_char_times(tokens, times, is_bpe):
    out = []
    for t, bt in zip(tokens, times):
        t = t.replace("▁", " ") if is_bpe else t
        out.extend([bt] * len(t))
    return out


@pytest.mark.parametrize("is_bpe", [False, True])
def test_reference_vector(spark, is_bpe):
    df = spark.createDataFrame(
        [("test", TOKENS, TIMES)],
        "query_id string, tokens array<string>, begin_times array<double>",
    )
    row = transcripts_from_tokens(df, is_bpe=is_bpe).collect()[0]
    expected_text = "".join(
        t.replace("▁", " ") if is_bpe else t for t in TOKENS
    )
    assert row.text == expected_text
    assert row.times_ok
    assert len(row.char_times) == len(expected_text)
    assert row.char_times == _expected_char_times(TOKENS, TIMES, is_bpe)
    assert row.n_tokens == len(TOKENS)


def test_bpe_marker_becomes_space(spark):
    df = spark.createDataFrame(
        [("q", ["▁a", "▁", "bc"], [0.0, 1.0, 2.0])],
        "query_id string, tokens array<string>, begin_times array<double>",
    )
    row = transcripts_from_tokens(df, is_bpe=True).collect()[0]
    assert row.text == " a bc"
    assert row.char_times == [0.0, 0.0, 1.0, 2.0, 2.0]


def test_strictly_increasing_enforced(spark):
    df = spark.createDataFrame(
        [("bad", ["a", "b"], [1.0, 1.0])],
        "query_id string, tokens array<string>, begin_times array<double>",
    )
    with pytest.raises(ValueError, match="bad"):
        transcripts_from_tokens(df)
    rows = transcripts_from_tokens(df, strict=False).collect()
    assert rows[0].times_ok is False


def test_edge_shapes(spark):
    df = spark.createDataFrame(
        [("one", ["xy"], [0.5]), ("empty_tok", ["", "a"], [0.0, 1.0])],
        "query_id string, tokens array<string>, begin_times array<double>",
    )
    rows = {r.query_id: r for r in transcripts_from_tokens(df).collect()}
    assert rows["one"].char_times == [0.5, 0.5]
    assert rows["empty_tok"].text == "a"
    assert rows["empty_tok"].char_times == [1.0]
