"""Locate the sample datasets for the example recipes.

The samples are the public tiny excerpts shipped with the reference
(criteo_sample.txt / movielens_sample.txt / byterec_sample.txt).  They are
looked up in ``examples/data/`` first, then in the read-only reference
checkout if mounted; failing both, a synthetic stand-in with the same
schema is generated so every example stays runnable end-to-end.
"""

import os
import warnings

import numpy as np
import pandas as pd

_SEARCH_DIRS = [
    os.path.join(os.path.dirname(__file__), "data"),
    "/root/reference/examples",
]


def find_sample(name):
    for d in _SEARCH_DIRS:
        path = os.path.join(d, name)
        if os.path.exists(path):
            return path
    return None


def sample_is_synthetic(name):
    """True when ``load_*`` would fabricate data for this sample.

    Anything comparing against the reference (tools/parity_vs_reference.py)
    must refuse to report "parity" when this is True — synthetic stand-ins
    keep the recipes runnable but are a different dataset."""
    return find_sample(name) is None


def _synthetic_warning(name):
    warnings.warn(
        "sample dataset %r not found (searched %s) — generating a SYNTHETIC "
        "stand-in with the same schema. Results are NOT comparable with the "
        "reference on the real sample." % (name, _SEARCH_DIRS),
        stacklevel=3)


def load_criteo_sample(n_synth=200):
    """-> DataFrame with columns label, I1..I13, C1..C26."""
    path = find_sample("criteo_sample.txt")
    if path:
        return pd.read_csv(path)
    _synthetic_warning("criteo_sample.txt")
    rng = np.random.default_rng(2020)
    data = {"label": rng.integers(0, 2, n_synth)}
    for i in range(1, 14):
        col = rng.random(n_synth) * 100
        col[rng.random(n_synth) < 0.3] = np.nan
        data["I%d" % i] = col
    for i in range(1, 27):
        data["C%d" % i] = rng.integers(0, 30, n_synth).astype(str)
    return pd.DataFrame(data)


def load_movielens_sample(n_synth=200):
    path = find_sample("movielens_sample.txt")
    if path:
        return pd.read_csv(path)
    _synthetic_warning("movielens_sample.txt")
    rng = np.random.default_rng(2020)
    genres_pool = ["Action", "Comedy", "Drama", "Thriller", "Romance"]
    return pd.DataFrame({
        "user_id": rng.integers(1, 200, n_synth),
        "movie_id": rng.integers(1, 200, n_synth),
        "gender": rng.choice(["M", "F"], n_synth),
        "age": rng.choice([1, 18, 25, 35, 45, 50, 56], n_synth),
        "occupation": rng.integers(0, 21, n_synth),
        "zip": rng.integers(10000, 99999, n_synth).astype(str),
        "genres": ["|".join(rng.choice(genres_pool,
                                       rng.integers(1, 4), replace=False))
                   for _ in range(n_synth)],
        "rating": rng.integers(1, 6, n_synth),
    })


def load_byterec_sample(n_synth=500):
    """byterec: short-video CTR with two binary targets (finish, like)."""
    path = find_sample("byterec_sample.txt")
    if path:
        return pd.read_csv(
            path, sep="\t",
            names=["uid", "user_city", "item_id", "author_id", "item_city",
                   "channel", "finish", "like", "music_id", "device", "time",
                   "duration_time"])
    _synthetic_warning("byterec_sample.txt")
    rng = np.random.default_rng(2020)
    return pd.DataFrame({
        "uid": rng.integers(0, 100, n_synth),
        "user_city": rng.integers(0, 50, n_synth),
        "item_id": rng.integers(0, 300, n_synth),
        "author_id": rng.integers(0, 100, n_synth),
        "item_city": rng.integers(0, 50, n_synth),
        "channel": rng.integers(0, 5, n_synth),
        "finish": rng.integers(0, 2, n_synth),
        "like": rng.integers(0, 2, n_synth),
        "music_id": rng.integers(0, 90, n_synth),
        "device": rng.integers(0, 60, n_synth),
        "time": rng.integers(0, 10**6, n_synth),
        "duration_time": rng.integers(1, 60, n_synth),
    })
