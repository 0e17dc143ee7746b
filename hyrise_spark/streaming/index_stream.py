"""Streaming inverted-index maintenance — the incremental sibling of
pipeline/retrieval.py::text_inverted_index.

Production shape for keeping a text index fresh as documents arrive:

* The POSTINGS LOG is stateless: each micro-batch maps documents to
  (doc_id, term, tf) rows with a pure per-row expression (array_distinct +
  filter-count over the token array — no streaming groupBy, so no state
  store and no watermark), append output mode. Postings land partitioned
  by term exactly as the batch index's tf table would, ready to merge into
  posting shards.
* The TERM DIRECTORY (term -> df, total_tf) is the one stateful aggregate.
  Its state is VOCABULARY-sized — Heaps' law sublinear in corpus size, the
  one streaming state here that is genuinely bounded — so complete-mode
  output is the honest choice (the directory IS the full state).

Parity: the test pins streamed postings == batch tf rows and the streamed
directory == the batch index's df/total_tf, across a multi-file (hence
multi-micro-batch) ingestion.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# One schema/reader for document streams, shared with the curation streams —
# a second hand-maintained copy would silently drift when columns change.
from hyrise_spark.streaming.curate_stream import (  # noqa: F401
    DOCS_SCHEMA,
    read_documents_stream,
)


def postings_log_stream(docs: DataFrame) -> DataFrame:
    """Stateless (doc_id, term, tf) extraction: tf is computed INSIDE each
    row (count of the term in the doc's own token array), so exploding
    distinct terms yields exactly the batch tf table without a streaming
    groupBy. Works identically on a batch frame (the parity contract)."""
    w = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    entries = F.transform(
        F.array_distinct(w),
        lambda t: F.struct(
            t.alias("term"),
            F.size(F.filter(w, lambda x: x == t)).cast("long").alias("tf"),
        ),
    )
    return (
        docs.select("doc_id", F.explode(entries).alias("e"))
        .select("doc_id", F.col("e.term").alias("term"), F.col("e.tf").alias("tf"))
    )


def term_directory_stream(postings: DataFrame) -> DataFrame:
    """term -> (df, total_tf): the one stateful aggregate; state size is the
    vocabulary (Heaps-sublinear), run in complete mode."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf")
    )
