"""IPInsights-style (entity, ip) anomaly scoring (reference M1-M3).

The reference trains SageMaker's IPInsights on 2-column (entity_id, ip)
CSV pairs (notebook cells 9-13: num_entity_vectors=20000, vector_dim=128,
random_negative_sampling_rate=5, mini_batch_size=1000, epochs=5,
lr=0.01) and scores pairs through an endpoint (cells 18-20;
flink-app/.../CallSageMakerTest.java:36-50), with a vestigial threshold
of 3.0 (test resources config.json:10-11).

Engine equivalent — capability parity, not loss-curve parity
(SURVEY.md §7.4.5):

- ``IPInsightsModel.train``: negative-sampling embedding trainer.
  Positive pairs pull entity/ip vectors together (sigmoid dot loss),
  sampled negatives push apart — the same objective family as the
  SageMaker algorithm. Training is DISTRIBUTED: the pair set never
  reaches the driver. Per epoch, current parameters are broadcast and
  each shard runs local minibatch SGD inside ``mapInPandas`` (Arrow
  batches = minibatches), emitting per-index parameter deltas; deltas
  shuffle on (kind, idx) — hash-partitioned parameter blocks — and are
  averaged per block with built-in array folds (classic parameter
  averaging / federated-SGD shape), so the driver receives only the
  final vocab-sized averaged rows. Driver memory is VOCAB-sized
  (reference scale: 20k entities x dim 128 ~ 10 MB — notebook cell
  11), data-sized state stays on executors. Beyond driver RAM the
  remaining step is sharding the parameter BROADCAST itself (the merge
  is already block-partitioned).
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
    # SageMaker's hash caps (notebook cell 11: num_entity_vectors=20000):
    # entities/IPs are HASHED into a fixed vector count, so parameter
    # matrices are config-bounded, not data-bounded. None = exact dense
    # indexing (every distinct value gets its own vector) — fine while
    # the vocab fits driver memory; set the caps for an unbounded space.
    num_entity_vectors=None,
    num_ip_vectors=None,
)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))


def _hash_slot(value: str, cap: int) -> int:
    """Python twin of :func:`_hash_slot_col` — md5 first-8-hex mod cap.

    md5 is the one hash both Spark SQL and Python compute identically
    (same UTF-8 bytes in, same hex out), so executor-side indexing and
    driver-side scoring agree without shipping any vocabulary."""
    import hashlib

    return int(hashlib.md5(value.encode("utf-8")).hexdigest()[:8], 16) % cap


def _hash_slot_col(col: str, cap: int) -> Column:
    """Spark twin of :func:`_hash_slot`: slot index as a column expression.

    This is the whole point of the cap: the index is a narrow map-side
    expression — no distinct, no shuffle, no collected vocab dict."""
    return (
        F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("long") % cap
    )


def _stable_index_frame(
    df: DataFrame, col: str, idx_name: str, num_partitions: int | None = None
) -> DataFrame:
    """Distributed stable dense index: (value, 0-based rank ordered by
    value) over the column's distinct values.

    Replaces ``row_number().over(Window.orderBy(col))`` — a
    SINGLE-TASK global window, fine at the reference's 20k entities but
    a scale-killer if the vocab is the IP space (VERDICT r2 #4). Here:
    range-repartition the distinct values (so partition p's values all
    precede partition p+1's), sort within partitions, collect only the
    per-partition COUNTS to compute offsets (num_partitions scalars),
    then add offset + local position in a narrow Arrow pass. The
    resulting mapping is exactly the global sorted dense rank no matter
    how the range boundaries were sampled.
    """
    from pyspark import TaskContext

    spark = df.sparkSession
    n = num_partitions or min(spark.sparkContext.defaultParallelism, 32)
    d = (
        df.select(col)
        .distinct()
        .repartitionByRange(n, F.col(col))
        .sortWithinPartitions(col)
        .localCheckpoint(eager=True)
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in d.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = spark.sparkContext.broadcast(offsets)

    def add_idx(batches):
        pid = TaskContext.get().partitionId()
        off = bc.value.get(pid, 0)
        seen = 0
        for pdf in batches:
            yield pd.DataFrame(
                {
                    col: pdf[col],
                    idx_name: np.arange(off + seen, off + seen + len(pdf)),
                }
            )
            seen += len(pdf)

    return d.mapInPandas(add_idx, f"{col} string, {idx_name} long")


@dataclass
class IPInsightsModel:
    # Dense-index mode: dict vocab -> row. Hash-cap mode (the reference's
    # num_entity_vectors semantics): index is None and slots come from
    # md5(value) % cap — driver state is config-bounded (cap x dim).
    entity_index: dict[str, int] | None
    ip_index: dict[str, int] | None
    entity_vecs: np.ndarray  # (n_entities | num_entity_vectors, dim)
    ip_vecs: np.ndarray  # (n_ips | num_ip_vectors, dim)
    num_entity_vectors: int | None = None
    num_ip_vectors: int | None = None

    def _entity_slot(self, value: str) -> int | None:
        if self.num_entity_vectors is not None:
            return _hash_slot(value, self.num_entity_vectors)
        return self.entity_index.get(value)

    def _ip_slot(self, value: str) -> int | None:
        if self.num_ip_vectors is not None:
            return _hash_slot(value, self.num_ip_vectors)
        return self.ip_index.get(value)

    @classmethod
    def train(
        cls,
        pairs: DataFrame,
        entity_col: str = "entity",
        ip_col: str = "ip",
        num_shards: int | None = None,
        param_mode: str = "broadcast",
        **hyper,
    ) -> "IPInsightsModel":
        """Train on a 2-column pair DataFrame (M1), distributed.

        Pairs are index-encoded engine-side (broadcast joins against the
        vocab frames), hash-repartitioned by entity into ``num_shards``
        shards, and each epoch runs shard-local SGD via ``mapInPandas``
        against the broadcast parameters. Only vocab-sized artifacts
        (indexes, embeddings, per-shard deltas) ever reach the driver.

        ``param_mode``:

        - ``"broadcast"`` (default): the full (E, P) matrices broadcast
          each epoch — fine while both fit executor memory.
        - ``"sharded_entities"``: the ENTITY matrix ships as one
          broadcast SLICE per shard (pairs are partitioned by entity,
          so a task's entities are known up front; Spark's torrent
          broadcast is fetched lazily on first access, so each task
          pulls only its own slice's blocks). Shard membership is read
          off the checkpointed pair frame itself (TaskContext partition
          ids — ground truth, no hash re-derivation). BIT-IDENTICAL
          output to broadcast mode (same rows, same order, same RNG,
          same float ops — unit-pinned); what changes is the
          per-executor entity-matrix cost: both the broadcast TRANSFER
          and the resident WORKING SET drop to |E|/shards (the local
          matrices are full-index-space but calloc-lazy — only slice
          rows are ever written). The
          IP matrix stays whole because negative sampling draws from
          the FULL ip space (algorithm-inherent); beyond that the
          documented approximation is shard-local negative pools.
        """
        hp = {**DEFAULTS, **hyper}
        spark = pairs.sparkSession
        sdf = pairs.select(
            F.col(entity_col).cast("string").alias("entity"),
            F.col(ip_col).cast("string").alias("ip"),
        )
        e_cap, i_cap = hp["num_entity_vectors"], hp["num_ip_vectors"]
        # Index encoding, per axis:
        # - hash-cap mode (reference num_entity_vectors, cell 11): slot =
        #   md5(value) % cap, a narrow map-side expression — no distinct,
        #   no vocab collect; driver/executor matrices are (cap, dim).
        # - dense mode: distributed distinct + distributed stable dense
        #   index (range partitions + offsets — no single-task window).
        if e_cap is not None:
            e_idx, n_e = None, int(e_cap)
            ei_col = _hash_slot_col("entity", e_cap).alias("ei")
            enc = sdf.select(ei_col, "ip")
        else:
            ents_df = _stable_index_frame(sdf, "entity", "ei")
            e_idx = {r["entity"]: r["ei"] for r in ents_df.collect()}
            n_e = len(e_idx)
            enc = sdf.join(F.broadcast(ents_df), "entity").select("ei", "ip")
        if i_cap is not None:
            i_idx, n_i = None, int(i_cap)
            enc = enc.select("ei", _hash_slot_col("ip", i_cap).alias("pi"))
        else:
            ips_df = _stable_index_frame(sdf, "ip", "pi")
            i_idx = {r["ip"]: r["pi"] for r in ips_df.collect()}
            n_i = len(i_idx)
            enc = enc.join(F.broadcast(ips_df), "ip").select("ei", "pi")
        rng = np.random.RandomState(hp["seed"])
        dim = hp["vector_dim"]
        E = (rng.rand(n_e, dim) - 0.5) / dim
        P = (rng.rand(n_i, dim) - 0.5) / dim

        n_ips = n_i
        lr, k = hp["learning_rate"], hp["neg_sampling_rate"]
        bs = hp["mini_batch_size"]
        seed = hp["seed"]
        shards = num_shards or min(spark.sparkContext.defaultParallelism, 16)

        indexed = (
            enc.repartition(shards, "ei")  # co-locate an entity's pairs
            .sortWithinPartitions("ei", "pi")  # deterministic shard order
        )
        indexed = indexed.localCheckpoint(eager=True)  # index once, not per epoch

        sc = spark.sparkContext
        shard_members: dict[int, np.ndarray] = {}
        if param_mode == "sharded_entities":
            # ground-truth shard membership off the checkpointed frame:
            # each entity lives in exactly one partition
            from pyspark import TaskContext as _TC

            def tag(batches):
                pid = _TC.get().partitionId()
                seen = set()
                for pdf in batches:
                    for ei in pdf["ei"].unique():
                        if ei not in seen:
                            seen.add(ei)
                yield pd.DataFrame(
                    {"pid": np.full(len(seen), pid), "ei": sorted(seen)}
                )

            for r in indexed.mapInPandas(tag, "pid int, ei long").collect():
                shard_members.setdefault(r["pid"], []).append(r["ei"])
            shard_members = {
                p: np.asarray(sorted(v), dtype=np.int64)
                for p, v in shard_members.items()
            }
        elif param_mode != "broadcast":
            raise ValueError(f"unknown param_mode {param_mode!r}")

        for epoch in range(hp["num_epochs"]):
            if param_mode == "sharded_entities":
                # one slice broadcast per shard; tasks lazily fetch only
                # their own (torrent blocks pull on first .value access)
                slice_bcs = {
                    p: sc.broadcast((ids, E[ids]))
                    for p, ids in shard_members.items()
                }
                bc = sc.broadcast(P)
            else:
                slice_bcs = None
                bc = sc.broadcast((E, P))

            def run_shard(
                batches,
                _epoch=epoch,
                _bc=bc,
                _slices=slice_bcs,
                _n_e=n_e,  # captured as a scalar — NOT the vocab dict
            ):
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
                if _slices is not None:
                    P0 = _bc.value
                    # full-shape index space, but only the slice's rows
                    # are ever WRITTEN (E0 stays calloc-lazy and El
                    # receives just the slice copy + SGD writes to
                    # shard-local entities), so resident entity memory
                    # is slice-sized — both the transfer AND the
                    # working-set bound are slice-scale; base values
                    # for the delta ride separately as e_base
                    E0 = np.zeros((_n_e, P0.shape[1]))
                    El = np.zeros((_n_e, P0.shape[1]))
                    if pid in _slices:
                        ids, Es = _slices[pid].value
                        E0[ids] = Es
                        El[ids] = Es
                else:
                    E0, P0 = _bc.value
                    El = E0.copy()
                Pl = P0.copy()
                srng = np.random.RandomState(
                    (seed * 1_000_003 + _epoch * 7919 + pid) % (2**31 - 1)
                )
                e_touch = np.zeros(len(El), dtype=bool)
                p_touch = np.zeros(len(Pl), dtype=bool)
                for pdf in batches:  # each Arrow batch: minibatch SGD
                    ei_a = pdf["ei"].to_numpy(np.int64)
                    pi_a = pdf["pi"].to_numpy(np.int64)
                    for start in range(0, len(ei_a), bs):
                        be, bp = ei_a[start : start + bs], pi_a[start : start + bs]
                        ev, pv = El[be], Pl[bp]
                        g = 1.0 - _sigmoid(np.einsum("ij,ij->i", ev, pv))
                        El[be] += lr * g[:, None] * pv
                        Pl[bp] += lr * g[:, None] * ev
                        e_touch[be] = True
                        p_touch[bp] = True
                        for _ in range(k):
                            neg = srng.randint(0, n_ips, size=len(be))
                            nv = Pl[neg]
                            ev = El[be]
                            gn = _sigmoid(np.einsum("ij,ij->i", ev, nv))
                            El[be] -= lr * gn[:, None] * nv
                            Pl[neg] -= lr * gn[:, None] * ev
                            p_touch[neg] = True
                out = []
                for kind, (loc, base, touch) in enumerate(
                    [(El, E0, e_touch), (Pl, P0, p_touch)]
                ):
                    idxs = np.flatnonzero(touch)
                    if len(idxs):
                        out.append(
                            pd.DataFrame(
                                {
                                    "kind": np.full(len(idxs), kind, dtype=np.int32),
                                    "idx": idxs,
                                    "delta": list(loc[idxs] - base[idxs]),
                                }
                            )
                        )
                if out:
                    yield from out

            # parameter-averaging merge, DISTRIBUTED: per-shard deltas
            # shuffle on (kind, idx) — the hash-partitioned parameter
            # blocks — and each block averages its shard contributions
            # with built-in array folds; the driver receives only the
            # final vocab-sized averaged rows (shards× less traffic than
            # collecting raw deltas, and no driver-side merge loop)
            deltas = indexed.mapInPandas(
                run_shard, "kind int, idx long, delta array<double>"
            )
            merged = (
                deltas.groupBy("kind", "idx")
                .agg(
                    F.aggregate(
                        F.collect_list("delta"),
                        F.expr(f"array_repeat(CAST(0.0 AS DOUBLE), {dim})"),
                        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
                    ).alias("s"),
                    F.count(F.lit(1)).alias("c"),
                )
                .select("kind", "idx", F.expr("transform(s, v -> v / c)").alias("d"))
            )
            for r in merged.collect():
                tgt = E if r["kind"] == 0 else P
                tgt[r["idx"]] += np.asarray(r["d"])
            bc.unpersist()
            if slice_bcs:
                for b in slice_bcs.values():
                    b.unpersist()
        return cls(e_idx, i_idx, E, P, num_entity_vectors=e_cap, num_ip_vectors=i_cap)

    def score_pairs(self, entities: np.ndarray, ips: np.ndarray) -> np.ndarray:
        """Vectorized anomaly scores. Dense mode: unseen entity/ip -> 0
        vector (score 0, 'no evidence', cold-start neutrality). Hash-cap
        mode: every value hashes to a trained slot — SageMaker's
        semantics, where unseen values collide into existing vectors."""
        dim = self.entity_vecs.shape[1]
        ev = np.zeros((len(entities), dim))
        pv = np.zeros((len(ips), dim))
        for i, e in enumerate(entities):
            j = self._entity_slot(e)
            if j is not None:
                ev[i] = self.entity_vecs[j]
        for i, p in enumerate(ips):
            j = self._ip_slot(p)
            if j is not None:
                pv[i] = self.ip_vecs[j]
        return -np.einsum("ij,ij->i", ev, pv)

    def scorer_udf(self, spark: SparkSession):
        """Broadcast-backed vectorized pandas UDF (M2)."""
        from pyspark.sql.functions import pandas_udf

        bc = spark.sparkContext.broadcast(
            (
                self.entity_index,
                self.ip_index,
                self.entity_vecs,
                self.ip_vecs,
                self.num_entity_vectors,
                self.num_ip_vectors,
            )
        )

        @pandas_udf(DoubleType())
        def score(entity: pd.Series, ip: pd.Series) -> pd.Series:
            e_idx, i_idx, E, P, e_cap, i_cap = bc.value
            model = IPInsightsModel(e_idx, i_idx, E, P, e_cap, i_cap)
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
