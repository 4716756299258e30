"""Deterministic synthetic Common-Crawl-style pages table.

Schema per BASELINE.json input_hint: (url string, warc_ts timestamp,
html binary, text string, lang string). Each page embeds 0-5 geo
mentions ("geo:<lat>,<lon>") drawn from seeded cluster centers with a
skewed (zipf-ish) cluster popularity so hot grid cells exist — the skew
fixtures the north_rule asks us to handle explicitly.

Generation is fully deterministic AND partition-independent: every
random draw derives from splitmix64(doc_id * K + stream), vectorized in
numpy inside ``mapInPandas`` (Arrow-batched; no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
_LANGS = np.array(["en", "de", "zh", "fr", "es"])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog data page web crawl spark tile "
    "map road city river north south east west street park lake hill".split()
)
N_CLUSTERS = 24
_GOLDEN = 0x9E3779B97F4A7C15


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(_GOLDEN)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(doc_id: np.ndarray, stream: int) -> np.ndarray:
    h = _splitmix64(doc_id.astype(np.uint64) * np.uint64(1000) + np.uint64(stream))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def cluster_centers(seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-60, 60, N_CLUSTERS)
    lon = rng.uniform(-170, 170, N_CLUSTERS)
    return np.stack([lat, lon], axis=1)


def generate_pages(
    spark: SparkSession, n_docs: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    centers = cluster_centers(seed)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            m = len(ids)
            n_geo = (_u01(ids, 1) * 6).astype(np.int64)  # 0..5 mentions
            # zipf-ish cluster popularity: P(c) ~ 1/(c+1)
            weights = 1.0 / (np.arange(N_CLUSTERS) + 1.0)
            cdf = np.cumsum(weights) / weights.sum()
            n_words = 20 + (_u01(ids, 2) * 40).astype(np.int64)
            langs = _LANGS[(_u01(ids, 3) * len(_LANGS)).astype(np.int64)]
            texts, htmls = [], []
            for i in range(m):
                did = ids[i]
                word_draws = _splitmix64(
                    np.uint64(did) * np.uint64(1000_000)
                    + np.arange(n_words[i], dtype=np.uint64)
                ) % np.uint64(len(_WORDS))
                toks = _WORDS[word_draws.astype(np.int64)].tolist()
                for g in range(int(n_geo[i])):
                    u_c = _u01(np.array([did]), 10 + 3 * g)[0]
                    c = int(np.searchsorted(cdf, u_c))
                    c = min(c, N_CLUSTERS - 1)
                    jlat = (_u01(np.array([did]), 11 + 3 * g)[0] - 0.5) * 2.0
                    jlon = (_u01(np.array([did]), 12 + 3 * g)[0] - 0.5) * 2.0
                    lat = centers[c, 0] + jlat
                    lon = centers[c, 1] + jlon
                    pos = 1 + (g * 7) % max(len(toks) - 1, 1)
                    toks.insert(pos, f"geo:{lat:.5f},{lon:.5f}")
                text = " ".join(toks)
                texts.append(text)
                htmls.append(f"<html><body>{text}</body></html>".encode())
            yield pd.DataFrame(
                {
                    "url": [f"https://example.org/doc/{d}" for d in ids],
                    "warc_ts": pd.to_datetime(1_700_000_000 + ids, unit="s"),
                    "html": htmls,
                    "text": texts,
                    "lang": langs,
                }
            )

    rng_df = (
        spark.range(n_docs)
        if num_partitions is None
        else spark.range(0, n_docs, 1, num_partitions)
    )
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)
