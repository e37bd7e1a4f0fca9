"""Watermarked stream-stream time-band join.

The streaming twin of the batch ``asof.band_join``: correlate two live
event streams within a time band (error→click attribution, crawl
fetch→parse latency pairing) without landing either stream first.

Spark refuses stream-stream joins with no equality predicate (state
matching would be all-pairs), so the SAME two-bin composition as the
batch operator supplies one: both sides are bucketed into band-width
bins, the left stream probes its own bin and the next (a half-open band
spans at most two), and exactly one bin equality holds per matching
pair — no duplicate elimination needed.  The raw event-time band
condition rides along, and because both sides are watermarked Spark
derives state retention from it: buffered rows evict once the watermark
passes ``ts + band``, so state is bounded by (band + lateness) ×
arrival rate per bin, never by stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_band_join(left: DataFrame, right: DataFrame,
                     band_us: int = 600_000_000,
                     watermark: str = "20 minutes",
                     left_time: str = "ts",
                     right_time: str = "ts") -> DataFrame:
    """Inner-join rows of two streams where
    ``left_time < right_time <= left_time + band_us`` (microseconds).

    Column names from both sides survive with ``l_``/``r_`` prefixes.
    """
    lt = (left.select(*(F.col(c).alias(f"l_{c}") for c in left.columns))
          .withWatermark(f"l_{left_time}", watermark))
    rt = (right.select(*(F.col(c).alias(f"r_{c}") for c in right.columns))
          .withWatermark(f"r_{right_time}", watermark))
    lbin = F.floor(F.unix_micros(F.col(f"l_{left_time}")) / F.lit(band_us))
    lt = lt.withColumn("__bin", F.explode(F.array(lbin, lbin + 1)))
    rt = rt.withColumn("__bin", F.floor(
        F.unix_micros(F.col(f"r_{right_time}")) / F.lit(band_us)))
    cond = F.expr(
        f"r_{right_time} > l_{left_time} AND "
        f"r_{right_time} <= timestampadd(MICROSECOND, {band_us}, "
        f"l_{left_time})")
    return (lt.join(rt, (lt["__bin"] == rt["__bin"]) & cond)
            .drop("__bin"))


def enrich_stream(stream: DataFrame, dim: DataFrame, key: str,
                  how: str = "left") -> DataFrame:
    """Stream-static enrichment join: decorate live rows with a slowly-
    changing dimension (host reputation, language priors, blocklists)
    WITHOUT landing the stream first.

    Spark re-plans the static side per micro-batch, so a dimension
    backed by a table picks up updates between batches with no restart
    — the streaming analogue of a broadcast dim join, and the static
    side IS broadcast when it fits (no state store involved at all;
    unlike stream-stream joins this needs no watermark because the
    static side never grows during a batch).  Left join keeps
    unmatched stream rows (enrichment must never drop events)."""
    return stream.join(F.broadcast(dim), on=key, how=how)
