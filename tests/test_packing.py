"""Sequence packing (concat-and-chunk token budgeting) tests."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from baselinr_spark.operators.packing import pack_sequences, packing_summary


def test_pack_layout_exact(spark):
    # token counts: "a b" -> 2, "c d e f" -> 4, "" -> 0, "g h i" -> 3
    rows = [
        Row(shard="x", doc_id=1, text="a b"),
        Row(shard="x", doc_id=2, text="c d e f"),
        Row(shard="x", doc_id=3, text=""),
        Row(shard="x", doc_id=4, text="g h i"),
        Row(shard="y", doc_id=1, text="j k l m n"),
    ]
    out = {
        (r["shard"], r["doc_id"]): r
        for r in pack_sequences(
            spark.createDataFrame(rows), "doc_id", "text", budget=4,
            pack_key="shard",
        ).collect()
    }
    # shard x stream: doc1 tokens 0-1, doc2 tokens 2-5, doc3 empty at 6,
    # doc4 tokens 6-8; budget 4 -> seqs [0..3], [4..7], [8..11]
    assert (out[("x", 1)]["seq_id"], out[("x", 1)]["seq_offset"],
            out[("x", 1)]["n_seqs_spanned"]) == (0, 0, 1)
    assert (out[("x", 2)]["seq_id"], out[("x", 2)]["seq_offset"],
            out[("x", 2)]["n_seqs_spanned"]) == (0, 2, 2)  # spans 0->1
    assert (out[("x", 3)]["seq_id"], out[("x", 3)]["n_tokens"],
            out[("x", 3)]["n_seqs_spanned"]) == (1, 0, 1)
    assert (out[("x", 4)]["seq_id"], out[("x", 4)]["seq_offset"],
            out[("x", 4)]["n_seqs_spanned"]) == (1, 2, 2)  # tokens 6-8
    # shard y packs independently from offset 0
    assert (out[("y", 1)]["seq_id"], out[("y", 1)]["seq_offset"]) == (0, 0)

    summ = {
        r["shard"]: r
        for r in packing_summary(
            pack_sequences(spark.createDataFrame(rows), "doc_id", "text",
                           budget=4, pack_key="shard"),
            pack_key="shard",
        ).collect()
    }
    assert summ["x"]["n_docs"] == 4 and summ["x"]["total_tokens"] == 9
    # shard x: 9 tokens at budget 4 -> 3 sequences (doc4 reaches token 8,
    # which sits in chunk 2); shard y: 5 tokens -> 2 sequences.
    assert summ["x"]["n_seqs"] == 3 and summ["x"]["n_spanning"] == 2
    assert summ["y"]["n_seqs"] == 2


def test_pack_offsets_contiguous(spark, warehouse):
    """Within each pack key the layout is a gapless token stream:
    every doc's start equals the previous doc's start + tokens."""
    pages = spark.read.parquet(warehouse).where(F.col("text").isNotNull())
    out = pack_sequences(pages, "url", "text", budget=2048, pack_key="dt")
    start = (F.col("seq_id") * 2048 + F.col("seq_offset")).alias("start")
    rows = out.select("dt", "url", "n_tokens", start).collect()
    by_key: dict = {}
    for r in sorted(rows, key=lambda r: (r["dt"], r["url"])):
        assert r["start"] == by_key.get(r["dt"], 0)
        by_key[r["dt"]] = r["start"] + r["n_tokens"]


def test_truncation_loss_hand_computed(spark):
    """Group g: docs of 3 and 5 words; L=4 keeps 3+4=7 of 8 tokens
    (loss 1/8, one doc truncated); L=8 keeps all (loss 0)."""
    from baselinr_spark.operators.packing import truncation_loss

    df = spark.createDataFrame(
        [("g", "a b c"), ("g", "a b c d e")], ["src", "text"]
    )
    got = {r["seq_len"]: r
           for r in truncation_loss(df, "src", "text",
                                    seq_lens=(4, 8)).collect()}
    assert got[4]["n_docs"] == 2 and got[4]["total_tokens"] == 8
    assert got[4]["kept_tokens"] == 7 and got[4]["docs_truncated"] == 1
    assert abs(got[4]["loss_frac"] - 0.125) < 1e-12
    assert got[8]["kept_tokens"] == 8 and got[8]["docs_truncated"] == 0
    assert got[8]["loss_frac"] == 0.0
