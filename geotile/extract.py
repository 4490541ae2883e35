"""Deterministic HTML -> text extraction + coordinate-mention parsing.

The north_rule's per-row invariant: the extracted ``text`` for a given
``url`` must be byte-identical across runs and parallelism levels.  The
extractor is therefore a pure function of the html bytes — vectorized
pandas ``.str`` regex ops, no ambient state, no per-row Python.

Coordinate mentions are decimal-degree pairs like "39.928167,
116.389550" found in page text; they become the page's points for tile
assignment and spatial joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, StringType, StructField,
                               StructType)

# script/style blocks go first, then all tags, then entities, then
# whitespace normalization — order matters and is part of the contract.
_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]

# decimal-degree pair: lat in [-90, 90], lon in [-180, 180], 3-7 dp
COORD_RE = r"(-?\d{1,2}\.\d{3,7})\s*,\s*(-?\d{1,3}\.\d{3,7})"


def extract_text_pd(html: pd.Series) -> pd.Series:
    """Pure-pandas extraction: bytes/str html -> canonical text."""
    # vectorized decode (no per-row Python): Series.str.decode handles
    # the bytes rows (same codec + errors="replace" as bytes.decode);
    # non-bytes rows (already-str inputs, nulls) come back NaN and are
    # filled from the original values
    dec = html.str.decode("utf-8", "replace")
    s = dec.where(dec.notna(), html)
    s = s.astype("string")
    s = s.str.replace(r"(?is)<(script|style)\b.*?</\1>", " ", regex=True)
    s = s.str.replace(r"(?s)<[^>]*>", " ", regex=True)
    for ent, rep in _ENTITIES:
        s = s.str.replace(ent, rep, regex=False)
    s = s.str.replace(r"\s+", " ", regex=True).str.strip()
    return s.astype(object)


def with_text(df: DataFrame, html_col: str = "html", out: str = "text") -> DataFrame:
    """Add the canonical ``text`` column (Arrow-batched pandas UDF)."""

    @F.pandas_udf(StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return extract_text_pd(html)

    return df.withColumn(out, _extract(F.col(html_col)))


def parse_mentions_pd(text: pd.Series) -> pd.DataFrame:
    """text Series (indexed 0..n-1) -> DataFrame(row_idx, lat, lon) of
    all in-range coordinate mentions, vectorized via str.extractall."""
    found = text.astype("string").str.extractall(COORD_RE)
    if found.empty:
        return pd.DataFrame({"row_idx": np.array([], dtype=np.int64),
                             "lat": np.array([], dtype=np.float64),
                             "lon": np.array([], dtype=np.float64)})
    lat = found[0].astype(np.float64)
    lon = found[1].astype(np.float64)
    ok = (lat >= -90) & (lat <= 90) & (lon >= -180) & (lon <= 180)
    return pd.DataFrame({"row_idx": found.index.get_level_values(0)[ok].to_numpy(np.int64),
                         "lat": lat[ok].to_numpy(),
                         "lon": lon[ok].to_numpy()})


def with_mentions(df: DataFrame, text_col: str = "text", out: str = "mentions") -> DataFrame:
    """Add ``mentions: array<struct<lat,lon>>`` parsed from the text.
    Pages without mentions get an empty array (kept, not dropped)."""
    elem = StructType([StructField("lat", DoubleType()), StructField("lon", DoubleType())])

    @F.pandas_udf(ArrayType(elem))
    def _parse(text: pd.Series) -> pd.Series:
        t = text.reset_index(drop=True)
        m = parse_mentions_pd(t)
        # vectorized row grouping: (lat, lon) tuples come out of a
        # C-level to_records conversion and group by row index — no
        # Python loop over matches (the html-decode twin of this fix
        # is extract_text_pd's Series.str.decode)
        groups = pd.Series([[]] * len(t), index=range(len(t)), dtype=object)
        if len(m):
            recs = pd.Series(
                m[["lat", "lon"]].to_records(index=False).tolist(),
                index=m["row_idx"].to_numpy())
            groups.update(recs.groupby(level=0).agg(list))
        return groups

    return df.withColumn(out, _parse(F.col(text_col)))


def explode_mentions(df: DataFrame, key: str = "url",
                     mentions_col: str = "mentions") -> DataFrame:
    """(page rows) -> (key, lat, lon) point rows; pages with no
    mentions drop out (inner explode)."""
    return (df.select(key, F.explode(F.col(mentions_col)).alias("m"))
            .select(key, F.col("m.lat").alias("lat"), F.col("m.lon").alias("lon")))
