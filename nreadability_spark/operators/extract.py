"""The extraction operator: an Arrow-batched pandas UDF wrapping the
pure-Python core.

This is the single Python-side operator of the engine (SURVEY.md §2.1
runs entirely inside it); everything around it stays JVM-side. Design
constraints it satisfies:

- zero per-row Python dispatch: one Python invocation per Arrow batch
  (``pandas_udf``), matching the north-star requirement;
- a hostile row can never fail a task: per-row try/except emits an
  ``error`` column instead (a 10^12-row job must survive bad payloads);
- deterministic: the core is a pure function, so Spark is free to retry
  or speculate tasks without changing results;
- worker memory bounded: callers should cap
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (see
  ``plans.extract_job.tune_session``) because HTML payloads are large.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nreadability_spark.core.pdf import extract_pdf, looks_like_pdf
from nreadability_spark.core.transcoder import DEFAULT_OPTIONS, extract

EXTRACT_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("content_html", T.StringType()),
        T.StructField("content_text", T.StringType()),
        T.StructField("extracted", T.BooleanType()),
        T.StructField("next_page_url", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("start", T.IntegerType()),
                        T.StructField("end", T.IntegerType()),
                    ]
                )
            ),
        ),
        T.StructField("error", T.StringType()),
    ]
)

_EMPTY_ROW = {
    "title": None,
    "content_html": "",
    "content_text": "",
    "extracted": False,
    "next_page_url": None,
    "spans": [],
    "error": None,
}


def _extract_one(text, options):
    """One payload -> result row. Content-type dispatch happens here —
    the single Python stage of the job: PDF payloads (sniffed by magic
    header, the content-type column being optional upstream metadata)
    route to the layout parser in ``core.pdf``; everything else runs the
    NReadability HTML core. Both emit the same struct."""
    if text is None or text == "":
        return dict(_EMPTY_ROW)
    try:
        if looks_like_pdf(text):
            pdf = extract_pdf(text)
            return {
                "title": pdf.title,
                "content_html": pdf.content_html,
                "content_text": pdf.content_text,
                "extracted": pdf.extracted,
                "next_page_url": None,
                "spans": [{"start": s, "end": e} for s, e in pdf.spans],
                "error": None,
            }
        result = extract(text, None, options)
        return {
            "title": result.title,
            "content_html": result.content_html,
            "content_text": result.content_text,
            "extracted": result.extracted,
            "next_page_url": result.next_page_url,
            "spans": [{"start": s, "end": e} for s, e in result.spans],
            "error": None,
        }
    except Exception as exc:  # noqa: BLE001 — never fail the task on one row
        row = dict(_EMPTY_ROW)
        row["error"] = f"{type(exc).__name__}: {exc}"[:500]
        return row


def make_extract_udf(options=None, include_html=True):
    """Build the extraction pandas UDF.

    ``include_html=False`` drops the (large) ``content_html`` payload at
    the source — Catalyst cannot prune struct fields produced inside a
    Python UDF, so not materializing them is the pruning.
    """
    opts = options or DEFAULT_OPTIONS

    @F.pandas_udf(EXTRACT_RESULT_SCHEMA)
    def extract_udf(texts):
        import pandas as pd

        # adversarially deep DOMs: the parser keeps a list stack, but
        # hostile inputs can still nest regex/DOM work deeply
        if sys.getrecursionlimit() < 20000:
            sys.setrecursionlimit(20000)

        # columnar accumulation: dict-of-lists -> DataFrame is much
        # cheaper than list-of-dicts for wide string columns
        names = list(EXTRACT_RESULT_SCHEMA.names)
        cols = {name: [] for name in names}
        for text in texts:
            row = _extract_one(text, opts)
            if not include_html:
                row["content_html"] = ""
            for name in names:
                cols[name].append(row[name])
        return pd.DataFrame(cols, columns=names)

    return extract_udf


def extract_columns(df, text_col="text", options=None, include_html=True, result_col="extract"):
    """Append extraction result columns to a transcripts DataFrame.

    The struct is expanded into flat columns so downstream plans (window,
    write partitioning) are ordinary Catalyst expressions.
    """
    udf = make_extract_udf(options=options, include_html=include_html)
    out = df.withColumn(result_col, udf(F.col(text_col)))
    for field in EXTRACT_RESULT_SCHEMA.names:
        out = out.withColumn(field, F.col(f"{result_col}.{field}"))
    return out.drop(result_col)
