"""Property test for corpus-wide boilerplate-segment removal: random
corpora with a planted shared-segment structure vs a pure-Python mirror
of the CCNet-style rule (segment -> distinct-doc df -> drop hot ->
rejoin in order)."""

from __future__ import annotations

import math
import random
from collections import defaultdict

from erddap2agol_spark.operators import text as T


def _py_segments(text: str, k: int) -> list[str]:
    # mirror of split(lower, '\s+'): re.split keeps the empty token an
    # empty/leading-whitespace doc produces, unlike str.split
    import re

    toks = re.split(r"\s+", text.lower())
    n_seg = math.ceil(len(toks) / k)
    return [" ".join(toks[i * k : i * k + k]) for i in range(n_seg)]


def _py_boilerplate(rows: list[tuple[int, str]], k: int, max_df: int):
    df = defaultdict(set)
    for doc_id, text in rows:
        for seg in set(_py_segments(text, k)):
            df[seg].add(doc_id)
    hot = {s for s, docs in df.items() if len(docs) > max_df}
    out = {}
    for doc_id, text in rows:
        segs = _py_segments(text, k)
        kept = [s for s in segs if s not in hot]
        out[doc_id] = (
            len(segs),
            len(segs) - len(kept),
            round((len(segs) - len(kept)) / len(segs), 6),
            " ".join(kept),
        )
    return hot, out


def test_random_corpora_match_python_mirror(spark):
    rng = random.Random(90210)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(4):
        k = rng.choice([2, 3, 4])
        max_df = rng.choice([1, 2, 3])
        n_docs = rng.randint(8, 40)
        # a few "template" segments planted across many docs + random filler
        templates = [
            " ".join(rng.choice(vocab) for _ in range(k)) for _ in range(3)
        ]
        rows = []
        for i in range(n_docs):
            words: list[str] = []
            for _ in range(rng.randint(0, 6)):
                if rng.random() < 0.4:
                    words.extend(rng.choice(templates).split())
                else:
                    words.extend(
                        rng.choice(vocab) for _ in range(rng.randint(1, k))
                    )
            # word-count padding so planted templates land on random
            # segment boundaries, not always offset 0
            rows.append((i, " ".join(words) if words else ""))
        exp_hot, exp_docs = _py_boilerplate(rows, k, max_df)

        docs = spark.createDataFrame(rows, "doc_id int, text string")
        got_hot = {
            r.seg
            for r in T.boilerplate_hot_segments(
                docs, "doc_id", "text", seg_tokens=k, max_df=max_df
            ).collect()
        }
        assert got_hot == exp_hot, (trial, k, max_df)
        got = {
            r.doc_id: (r.n_segments, r.n_removed, r.removed_frac, r.clean_text)
            for r in T.boilerplate_removal(
                docs, "doc_id", "text", seg_tokens=k, max_df=max_df
            ).collect()
        }
        assert got == exp_docs, (trial, k, max_df)
