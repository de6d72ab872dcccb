"""Deterministic synthetic transcript fixtures (FIXTURES.md §1-2).

Schema per BASELINE.json input_hint:
  (conv_id string, turn_idx int32, role string, text string,
   tool string, ts timestamp)

Seeded numpy generation; Zipf(1.2) vocabulary for hot-term skew (so
salting paths are actually exercised); a seeded 2% of turns get the
PDF-artifact noise classes from the reference's fuzzy tests
(/root/reference/src/fuzzy.rs:183-287) injected, so the normalizer is
load-bearing, not decorative.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

_VOCAB_SIZE = 2000
_ROLES = ["user", "assistant", "tool"]

_ARTIFACTS = [
    lambda w: w[: max(1, len(w) // 2)] + "-\n" + w[len(w) // 2 :],  # hyphen break
    lambda w: w[: max(1, len(w) // 2)] + "­" + w[len(w) // 2 :],  # soft hyphen
    lambda w: w[: max(1, len(w) // 2)] + "​" + w[len(w) // 2 :],  # zero-width
    lambda w: "“" + w + "”",  # curly quotes
    lambda w: w + "—next",  # em-dash join
    lambda w: w + "  extra",  # NBSP + double space
    lambda w: w.replace("fi", "ﬁ").replace("fl", "ﬂ").replace("ff", "ﬀ"),  # ligatures
]


def _vocab() -> list[str]:
    rng = np.random.default_rng(7)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = set()
    out = []
    while len(out) < _VOCAB_SIZE:
        n = int(rng.integers(3, 10))
        w = "".join(rng.choice(letters, size=n))
        if w not in words:
            words.add(w)
            out.append(w)
    return out


VOCAB = _vocab()


def make_transcripts(n_convs: int = 100, seed: int = 42) -> pd.DataFrame:
    """Generate the transcripts table as pandas (seeded, deterministic)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(VOCAB)
    # Zipf(1.2) over vocab ranks, truncated
    ranks = np.arange(1, _VOCAB_SIZE + 1, dtype=np.float64)
    probs = ranks ** -1.2
    probs /= probs.sum()

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    for c in range(n_convs):
        n_turns = int(rng.integers(5, 41))
        conv = f"conv{c:08d}"
        for t in range(n_turns):
            role = _ROLES[(t + int(rng.integers(0, 3))) % 3]
            n_words = int(rng.integers(5, 121))
            words = list(rng.choice(vocab, size=n_words, p=probs))
            if rng.random() < 0.02 and words:
                k = int(rng.integers(0, len(words)))
                fn = _ARTIFACTS[int(rng.integers(0, len(_ARTIFACTS)))]
                words[k] = fn(words[k])
            conv_ids.append(conv)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(" ".join(words))
            tools.append(f"tool{int(rng.integers(0, 8))}" if role == "tool" else None)
            tss.append(base + dt.timedelta(hours=c, seconds=t))
    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": pd.array(turn_idxs, dtype="int32"),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": tss,
        }
    )


def make_transcripts_distributed(spark, n_convs: int, seed: int = 42):
    """Distributed deterministic transcript generation: one seeded RNG
    per conv (seed ⊕ conv index), generated inside mapInPandas — scales
    to any corpus size with no driver bottleneck, fully reproducible
    regardless of partitioning."""
    import pyspark.sql.functions as F

    vocab_list = list(VOCAB)

    def gen(batches):
        import datetime as dt

        import numpy as np
        import pandas as pd

        vocab = np.array(vocab_list)
        ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
        probs = ranks ** -1.2
        probs /= probs.sum()
        base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
        for pdf in batches:
            rows = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
            for c in pdf["id"].tolist():
                rng = np.random.default_rng(seed * 1_000_003 + int(c))
                n_turns = int(rng.integers(5, 41))
                conv = f"conv{c:08d}"
                for t in range(n_turns):
                    role = _ROLES[(t + int(rng.integers(0, 3))) % 3]
                    n_words = int(rng.integers(5, 121))
                    words = list(rng.choice(vocab, size=n_words, p=probs))
                    if rng.random() < 0.02 and words:
                        k = int(rng.integers(0, len(words)))
                        fn = _ARTIFACTS[int(rng.integers(0, len(_ARTIFACTS)))]
                        words[k] = fn(words[k])
                    rows["conv_id"].append(conv)
                    rows["turn_idx"].append(t)
                    rows["role"].append(role)
                    rows["text"].append(" ".join(words))
                    rows["tool"].append(
                        f"tool{int(rng.integers(0, 8))}" if role == "tool" else None
                    )
                    rows["ts"].append(base + dt.timedelta(hours=int(c), seconds=t))
            out = pd.DataFrame(rows)
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    par = spark.sparkContext.defaultParallelism
    return (
        spark.range(n_convs)
        .repartition(par)
        .mapInPandas(gen, schema=schema)
    )


def make_queries(n: int = 100, seed: int = 43) -> list[str]:
    """Reference query set (FIXTURES.md §2): mix of 1-term, 2-3-term,
    hot-term (Zipf head), rare-term (tail), absent-term, artifact-noised."""
    rng = np.random.default_rng(seed)
    queries: list[str] = []
    for i in range(n):
        kind = i % 6
        if kind == 0:  # single mid-frequency term
            queries.append(VOCAB[int(rng.integers(10, 200))])
        elif kind == 1:  # 2-3 term AND-ish
            k = int(rng.integers(2, 4))
            queries.append(" ".join(VOCAB[int(rng.integers(0, 500))] for _ in range(k)))
        elif kind == 2:  # hot term (Zipf head)
            queries.append(VOCAB[int(rng.integers(0, 5))])
        elif kind == 3:  # rare term (tail)
            queries.append(VOCAB[int(rng.integers(1500, _VOCAB_SIZE))])
        elif kind == 4:  # absent term → empty result
            queries.append("zzzzabsentterm" + str(i))
        else:  # artifact-noised query that must normalize to a match
            w = VOCAB[int(rng.integers(0, 300))]
            queries.append(w[: max(1, len(w) // 2)] + "­" + w[len(w) // 2 :])
    return queries
