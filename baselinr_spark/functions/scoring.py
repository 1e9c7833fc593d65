"""Fused model-scoring pandas UDF: langid + perplexity (+ optional scrub)
in ONE Arrow round trip.

Running langid, perplexity and scrub as separate pandas UDFs ships the
full ``text`` column across the JVM↔Python boundary three times per
direction. At 100 TB that triples Arrow serialization and Python-worker
batch overhead for no benefit — the three scorers are independent
per-document functions over the same input. This fused UDF applies all of
them in one pass and returns a struct, so the text crosses once.

Semantics are identical to the individual UDFs in ``langid.py`` /
``perplexity.py`` / ``scrub.py`` (same model objects, same pure-python
inner functions the oracle uses); tests assert parity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .langid import build_model as build_langid_model
from .langid import langid_batch
from .perplexity import build_model as build_ppl_model
from .perplexity import perplexity_batch
from .scrub import scrub_python

SCORING_SCHEMA = T.StructType([
    T.StructField("lang_pred", T.StringType()),
    T.StructField("lang_conf", T.DoubleType()),
    T.StructField("perplexity", T.DoubleType()),
    T.StructField("scrubbed_text", T.StringType()),
])

SCORING_SCHEMA_NOSCRUB = T.StructType(SCORING_SCHEMA.fields[:3])


def make_scoring_udf(spark, include_scrub: bool = True):
    bc_lid = spark.sparkContext.broadcast(build_langid_model())
    bc_ppl = spark.sparkContext.broadcast(build_ppl_model())
    schema = SCORING_SCHEMA if include_scrub else SCORING_SCHEMA_NOSCRUB

    @F.pandas_udf(schema)
    def scoring_udf(texts: pd.Series) -> pd.DataFrame:
        tl = list(texts)
        # langid + perplexity are both vectorized over the whole Arrow
        # batch (bit-identical to the scalar specs — langid_batch IS the
        # scalar kernel; see perplexity_batch); only the compiled-regex
        # scrub remains a per-document pass
        ppls = perplexity_batch(tl, bc_ppl.value)
        langs, confs = langid_batch(tl, bc_lid.value)
        out = {"lang_pred": langs, "lang_conf": confs, "perplexity": ppls}
        if include_scrub:
            # most documents carry no PII, so the scrub is the identity:
            # return NULL for them and let the caller coalesce with the
            # original column JVM-side — the unchanged text then never
            # crosses the Python→JVM boundary a second time (guide §4:
            # minimize bytes over the Arrow channel). scrubbed == text
            # → NULL → coalesce restores text: byte-identical output.
            out["scrubbed_text"] = [
                s if s != t else None
                for s, t in zip((scrub_python(t) for t in tl), tl)
            ]
        return pd.DataFrame(out)

    return scoring_udf
