"""KG-embedding training-data generators: deterministic random walks
and filtered negative sampling (operators/kg_train.py)."""

import hashlib

from pyspark.sql import functions as F

from kernel_memory_spark.operators import kg_train as KT


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


class TestRandomWalks:
    def test_follows_edges_and_matches_python_mirror(self, spark):
        # diamond: 1 -> {2,3}, 2 -> 4, 3 -> 4, 4 -> 1
        pairs = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 1)]
        adj = {1: [2, 3], 2: [4], 3: [4], 4: [1]}
        got = {
            r.walk_id: r
            for r in KT.random_walks(
                _edges(spark, pairs), walks_per_node=2, length=3
            ).collect()
        }
        assert len(got) == 8  # 4 start nodes x 2 walks
        for node in adj:
            for w in range(2):
                wid = f"{node}#{w}"
                cur, path = node, str(node)
                for step in (1, 2, 3):
                    nxt = min(
                        adj[cur],
                        key=lambda v: _md5(f"walk:{wid}:{step}:{v}"),
                    )
                    path += f"->{nxt}"
                    cur = nxt
                assert got[wid].path == path, wid
                assert got[wid].start == node
                assert got[wid].n_steps == 3

    def test_sink_terminates_walk(self, spark):
        # 1 -> 2 and 2 is a sink; only nodes WITH out-edges start walks
        out = {
            r.walk_id: r
            for r in KT.random_walks(
                _edges(spark, [(1, 2)]), walks_per_node=1, length=3
            ).collect()
        }
        assert set(out) == {"1#0"}
        assert out["1#0"].path == "1->2"
        assert out["1#0"].n_steps == 1  # stuck at the sink, path kept

    def test_neighbor_cap_restricts_choices(self, spark):
        # hub 1 -> 2..9; cap=2 keeps the two md5-smallest neighbors, so
        # every walk's first hop lands inside that retained set
        pairs = [(1, v) for v in range(2, 10)]
        kept = sorted(
            range(2, 10), key=lambda v: (_md5(f"walk:1:{v}"), v)
        )[:2]
        rows = KT.random_walks(
            _edges(spark, pairs), walks_per_node=4, length=1,
            neighbor_cap=2,
        ).collect()
        for r in rows:
            hop = int(r.path.split("->")[1])
            assert hop in kept, r

    def test_deterministic(self, spark):
        pairs = [(a, b) for a in range(6) for b in range(6) if a != b]
        df = _edges(spark, pairs)
        a = sorted(
            (r.walk_id, r.path)
            for r in KT.random_walks(df, 2, 4).collect()
        )
        b = sorted(
            (r.walk_id, r.path)
            for r in KT.random_walks(df.repartition(7), 2, 4).collect()
        )
        assert a == b  # layout-invariant


class TestNegativeSamples:
    def _triples(self, spark):
        rows = [
            ("d1", "lang", "en"), ("d2", "lang", "fr"),
            ("d3", "lang", "en"), ("d1", "source", "web"),
            ("d2", "source", "pdf"), ("d3", "source", "web"),
        ]
        return spark.createDataFrame(rows, "subj string, pred string, obj string")

    def test_filtered_and_matches_python_mirror(self, spark):
        t = self._triples(spark)
        got = {
            (r.subj, r.pred, r.neg_ix, r.obj_neg)
            for r in KT.negative_samples(t, k=3).collect()
        }
        pool = sorted({"en", "fr", "web", "pdf"})
        true = {("d1", "lang", "en"), ("d2", "lang", "fr"),
                ("d3", "lang", "en"), ("d1", "source", "web"),
                ("d2", "source", "pdf"), ("d3", "source", "web")}
        expect = set()
        for s, p, o in true:
            for i in range(3):
                idx = int(
                    _md5(f"neg|{s}|{p}|{o}|{i}")[:8], 16
                ) % len(pool)
                cand = pool[idx]
                if (s, p, cand) not in true:
                    expect.add((s, p, i, cand))
        assert got == expect
        # the filtered property, independently of the mirror
        for s, p, _, o_neg in got:
            assert (s, p, o_neg) not in true

    def test_corrupt_head_mode(self, spark):
        t = self._triples(spark)
        rows = KT.negative_samples(t, k=2, corrupt="subj").collect()
        assert rows and set(rows[0].asDict()) == {
            "obj", "pred", "neg_ix", "subj_neg"
        }
        subs = {"d1", "d2", "d3"}
        true = {(r.subj, r.pred, r.obj) for r in t.collect()}
        for r in rows:
            assert r.subj_neg in subs
            assert (r.subj_neg, r.pred, r.obj) not in true

    def test_deterministic_across_layouts(self, spark):
        t = self._triples(spark)
        a = sorted(map(tuple, KT.negative_samples(t, k=2).collect()))
        b = sorted(map(tuple,
                       KT.negative_samples(t.repartition(5), k=2).collect()))
        assert a == b


class TestNode2vecWalks:
    def _ring(self, spark, n=12):
        from kernel_memory_spark.operators import graph as GR

        und = spark.createDataFrame(
            [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
        )
        return GR.symmetrize(und)

    def test_return_bias_controls_step2(self, spark):
        from kernel_memory_spark.operators import kg_train as KT

        adj = self._ring(spark).cache()
        # return-heavy: step 2 should overwhelmingly go back to start
        back = KT.node2vec_walks(
            adj, walks_per_node=4, length=2,
            return_units=64, base_units=1, out_units=1,
        ).collect()
        frac_back = sum(
            1 for r in back
            if r.path.split("->")[0] == r.path.split("->")[2]
        ) / len(back)
        assert frac_back > 0.9
        # outward-heavy: returns should be rare
        out = KT.node2vec_walks(
            adj, walks_per_node=4, length=2,
            return_units=1, base_units=1, out_units=64,
        ).collect()
        frac_back2 = sum(
            1 for r in out
            if r.path.split("->")[0] == r.path.split("->")[2]
        ) / len(out)
        assert frac_back2 < 0.1

    def test_paths_follow_edges_and_deterministic(self, spark):
        from kernel_memory_spark.operators import kg_train as KT

        adj = self._ring(spark, 8).cache()
        a = KT.node2vec_walks(adj, walks_per_node=2, length=3)
        edge_set = {(r.src, r.dst) for r in adj.collect()}
        rows = a.collect()
        assert len(rows) == 16 and all(r.n_steps == 3 for r in rows)
        for r in rows:
            p = [int(x) for x in r.path.split("->")]
            for u, v in zip(p, p[1:]):
                assert (u, v) in edge_set
        b = KT.node2vec_walks(adj.repartition(5), walks_per_node=2,
                              length=3)
        assert sorted(map(tuple, rows)) == sorted(
            map(tuple, b.collect())
        )
