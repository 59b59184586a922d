"""Temporal joins (asof_join / range_join_bucketed) and greedy sequence
packing on hand-built inputs with hand-checked expectations."""

import pandas as pd
import pytest

from rsgislib_spark.functions.packing import pack_sequences
from rsgislib_spark.operators.temporal import asof_join, range_join_bucketed


class TestAsofJoin:
    def test_backward_with_ties_and_missing(self, spark):
        # right (quotes): user 1 at t=10 (v=100), t=20 (v=200); user 2 none
        right = spark.createDataFrame(
            pd.DataFrame(
                {"user": [1, 1], "t": [10, 20], "v": [100, 200]}
            )
        )
        # left (trades): t=5 (before any), t=10 (tie -> right counts),
        # t=15, t=25, and user 2 at t=50 (no predecessor)
        left = spark.createDataFrame(
            pd.DataFrame(
                {
                    "user": [1, 1, 1, 1, 2],
                    "t": [5, 10, 15, 25, 50],
                    "trade_id": [0, 1, 2, 3, 4],
                }
            )
        )
        out = (
            asof_join(left, right, "t", ["user"], ["v"], tiebreak_col=None)
            .toPandas()
            .sort_values("trade_id")
        )
        got = [None if pd.isna(x) else int(x) for x in out["asof_v"]]
        assert got == [None, 100, 100, 200, None]
        assert list(out.columns) == ["user", "t", "trade_id", "asof_v"]

    def test_left_rows_preserved(self, spark):
        left = spark.createDataFrame(
            pd.DataFrame({"user": [1] * 4, "t": [1, 2, 3, 4], "trade_id": range(4)})
        )
        right = spark.createDataFrame(
            pd.DataFrame({"user": [1], "t": [2], "v": [7]})
        )
        out = asof_join(left, right, "t", ["user"], ["v"]).toPandas()
        assert len(out) == 4


class TestRangeJoinBucketed:
    def _run(self, spark, points, intervals, bucket):
        pt = spark.createDataFrame(
            pd.DataFrame(points, columns=["k", "t", "pid"])
        )
        iv = spark.createDataFrame(
            pd.DataFrame(intervals, columns=["k", "s", "e", "iid"])
        )
        out = range_join_bucketed(pt, iv, "t", "s", "e", by=["k"], bucket=bucket)
        return sorted(
            (int(r["pid"]), int(r["iid"])) for r in out.collect()
        )

    def test_inclusive_bounds_and_key_isolation(self, spark):
        pairs = self._run(
            spark,
            points=[(1, 10, 0), (1, 15, 1), (1, 21, 2), (2, 15, 3)],
            intervals=[(1, 10, 20, 100), (2, 0, 5, 200)],
            bucket=7,
        )
        # t=10 (== start) and t=15 match; t=21 (> end) and user-2 point do not
        assert pairs == [(0, 100), (1, 100)]

    def test_interval_spanning_many_buckets(self, spark):
        pairs = self._run(
            spark,
            points=[(1, 3, 0), (1, 50, 1), (1, 99, 2), (1, 101, 3)],
            intervals=[(1, 0, 100, 5)],
            bucket=8,
        )
        assert pairs == [(0, 5), (1, 5), (2, 5)]

    def test_matches_plain_theta_join(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        pts = [(int(k), int(t), i) for i, (k, t) in enumerate(
            zip(rng.randint(0, 5, 200), rng.randint(0, 1000, 200)))]
        ivs = [(int(k), int(s), int(s + d), 1000 + i) for i, (k, s, d) in enumerate(
            zip(rng.randint(0, 5, 60), rng.randint(0, 950, 60), rng.randint(1, 80, 60)))]
        got = self._run(spark, pts, ivs, bucket=64)
        want = sorted(
            (pid, iid)
            for (k, t, pid) in pts
            for (k2, s, e, iid) in ivs
            if k == k2 and s <= t <= e
        )
        assert got == want


class TestPackSequences:
    def _pack(self, spark, rows, cap):
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["g", "i", "sz"])
        )
        out = pack_sequences(df, "g", "i", "sz", capacity=cap).toPandas()
        out = out.sort_values(["g", "i"])
        return list(zip(out["g"], out["i"], out["bin"], out["fill"]))

    def test_next_fit_semantics(self, spark):
        rows = [("a", 0, 300), ("a", 1, 200), ("a", 2, 20), ("a", 3, 500)]
        # 300 -> bin0(300); +200 -> bin0(500); +20 -> fits? 520>512 -> bin1(20);
        # +500 -> 520>512 -> bin2(500)
        got = self._pack(spark, rows, 512)
        assert got == [
            ("a", 0, 0, 300), ("a", 1, 0, 500), ("a", 2, 1, 20), ("a", 3, 2, 500),
        ]

    def test_oversize_doc_gets_own_bin(self, spark):
        rows = [("a", 0, 600), ("a", 1, 10), ("a", 2, 700), ("a", 3, 10)]
        got = self._pack(spark, rows, 512)
        # 600 alone (bin0); 10 -> 610>512 new bin1(10); 700 -> bin2; 10 -> bin3
        assert [b for (_, _, b, _) in got] == [0, 1, 2, 3]

    def test_groups_independent(self, spark):
        rows = [("a", 0, 500), ("b", 0, 500), ("a", 1, 500), ("b", 1, 12)]
        got = self._pack(spark, rows, 512)
        assert got == [
            ("a", 0, 0, 500), ("a", 1, 1, 500),
            ("b", 0, 0, 500), ("b", 1, 0, 512),
        ]
