"""IPInsights-style (entity, ip) anomaly scoring (reference M1-M3).

The reference trains SageMaker's IPInsights on 2-column (entity_id, ip)
CSV pairs (notebook cells 9-13: num_entity_vectors=20000, vector_dim=128,
random_negative_sampling_rate=5, mini_batch_size=1000, epochs=5,
lr=0.01) and scores pairs through an endpoint (cells 18-20;
flink-app/.../CallSageMakerTest.java:36-50), with a vestigial threshold
of 3.0 (test resources config.json:10-11).

Engine equivalent — capability parity, not loss-curve parity
(SURVEY.md §7.4.5):

- ``IPInsightsModel.train``: negative-sampling embedding trainer in
  NumPy. Positive pairs pull entity/ip vectors together (sigmoid dot
  loss), sampled negatives push apart — the same objective family as the
  SageMaker algorithm. Training pairs are collected to the driver (the
  reference's training sets are endpoint-payload-sized); at cluster
  scale the natural port is per-epoch distributed gradients over
  mapInPandas, noted as the scale path.
- ``score_dataframe``: broadcast the two embedding matrices, score with
  a vectorized pandas UDF (Arrow batches, pure NumPy dot products).
  anomaly_score = -(entity . ip): unfamiliar pairs score high
  (FIXTURES.md §3: higher = more anomalous).
- ``threshold_filter``: M3's ``score > threshold`` stage.
- CSV contracts (S8/S9): headerless 2-column read/write helpers.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints here
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

DEFAULTS = dict(
    vector_dim=128,
    num_epochs=5,
    learning_rate=0.01,
    neg_sampling_rate=5,
    mini_batch_size=1000,
    seed=42,
)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))


@dataclass
class IPInsightsModel:
    entity_index: dict[str, int]
    ip_index: dict[str, int]
    entity_vecs: np.ndarray  # (n_entities, dim)
    ip_vecs: np.ndarray  # (n_ips, dim)

    @classmethod
    def train(
        cls,
        pairs: DataFrame,
        entity_col: str = "entity",
        ip_col: str = "ip",
        **hyper,
    ) -> "IPInsightsModel":
        """Train on a 2-column pair DataFrame (M1)."""
        hp = {**DEFAULTS, **hyper}
        rows = pairs.select(
            F.col(entity_col).cast("string"), F.col(ip_col).cast("string")
        ).collect()
        ents = sorted({r[0] for r in rows})
        ips = sorted({r[1] for r in rows})
        e_idx = {e: i for i, e in enumerate(ents)}
        i_idx = {p: i for i, p in enumerate(ips)}
        rng = np.random.RandomState(hp["seed"])
        dim = hp["vector_dim"]
        E = (rng.rand(len(ents), dim) - 0.5) / dim
        P = (rng.rand(len(ips), dim) - 0.5) / dim

        ei = np.array([e_idx[r[0]] for r in rows], dtype=np.int64)
        pi = np.array([i_idx[r[1]] for r in rows], dtype=np.int64)
        n = len(rows)
        lr, k = hp["learning_rate"], hp["neg_sampling_rate"]
        bs = hp["mini_batch_size"]

        for _epoch in range(hp["num_epochs"]):
            order = rng.permutation(n)
            for start in range(0, n, bs):
                b = order[start : start + bs]
                be, bp = ei[b], pi[b]
                # positive step: pull together
                ev, pv = E[be], P[bp]
                g = 1.0 - _sigmoid(np.einsum("ij,ij->i", ev, pv))
                E[be] += lr * g[:, None] * pv
                P[bp] += lr * g[:, None] * ev
                # negative step: push apart k random ips per pair
                for _ in range(k):
                    neg = rng.randint(0, len(ips), size=len(b))
                    nv = P[neg]
                    ev = E[be]
                    gn = _sigmoid(np.einsum("ij,ij->i", ev, nv))
                    E[be] -= lr * gn[:, None] * nv
                    P[neg] -= lr * gn[:, None] * ev
        return cls(e_idx, i_idx, E, P)

    def score_pairs(self, entities: np.ndarray, ips: np.ndarray) -> np.ndarray:
        """Vectorized anomaly scores; unseen entity/ip -> 0 vector (score 0,
        i.e. 'no evidence', matching cold-start neutrality)."""
        dim = self.entity_vecs.shape[1]
        ev = np.zeros((len(entities), dim))
        pv = np.zeros((len(ips), dim))
        for i, e in enumerate(entities):
            j = self.entity_index.get(e)
            if j is not None:
                ev[i] = self.entity_vecs[j]
        for i, p in enumerate(ips):
            j = self.ip_index.get(p)
            if j is not None:
                pv[i] = self.ip_vecs[j]
        return -np.einsum("ij,ij->i", ev, pv)

    def scorer_udf(self, spark: SparkSession):
        """Broadcast-backed vectorized pandas UDF (M2)."""
        from pyspark.sql.functions import pandas_udf

        bc = spark.sparkContext.broadcast(
            (self.entity_index, self.ip_index, self.entity_vecs, self.ip_vecs)
        )

        @pandas_udf(DoubleType())
        def score(entity: pd.Series, ip: pd.Series) -> pd.Series:
            e_idx, i_idx, E, P = bc.value
            model = IPInsightsModel(e_idx, i_idx, E, P)
            return pd.Series(
                model.score_pairs(entity.to_numpy(str), ip.to_numpy(str))
            )

        return score

    def score_dataframe(
        self,
        spark: SparkSession,
        df: DataFrame,
        entity_col: str = "entity",
        ip_col: str = "ip",
        out_col: str = "anomaly_score",
    ) -> DataFrame:
        udf = self.scorer_udf(spark)
        return df.withColumn(out_col, udf(F.col(entity_col), F.col(ip_col)))


def threshold_filter(
    scored: DataFrame, threshold: float = 3.0, score_col: str = "anomaly_score"
) -> DataFrame:
    """M3: keep suspicious pairs (vestigial reference threshold 3.0 —
    flink-app/.../test/resources/config.json:10)."""
    return scored.where(F.col(score_col) > threshold)


def write_training_csv(pairs: DataFrame, path: str) -> None:
    """S9: headerless 2-column CSV, the IPInsights training contract
    (notebook cell 9: wr.s3.to_csv(header=False, index=False))."""
    pairs.write.mode("overwrite").option("header", False).csv(path)


def read_training_csv(
    spark: SparkSession, path: str, entity_col: str = "entity", ip_col: str = "ip"
) -> DataFrame:
    """S8: read the (entity, ip) reference CSV."""
    return (
        spark.read.option("header", False)
        .csv(path)
        .toDF(entity_col, ip_col)
    )


def training_pairs_from_events(events: DataFrame) -> DataFrame:
    """The notebook's Athena feature query (cell 7) re-expressed on the
    engine's flow-log events: SELECT interface_id, srcaddr WHERE both
    addresses are internal ('10.' prefix) — P6/P7 projection+predicate."""
    return events.where(
        F.col("ip_src").startswith("10.") & F.col("ip_dst").startswith("10.")
    ).select(
        F.col("writer_id").alias("entity"),
        F.col("ip_src").alias("ip"),
    )
