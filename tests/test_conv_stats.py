"""conversation_stats value correctness vs a direct pandas aggregate."""

import pandas as pd
import pyarrow as pa


def test_conversation_stats_values(ray_session):
    import ray.data

    from texoo_ray.pipelines.conversations import conversation_stats
    from texoo_ray.sources.turns import turns_table

    tbl = turns_table(0, 25, seed=42)
    got = (
        conversation_stats(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    df = tbl.to_pandas()
    want = (
        df.groupby("conv_id")
        .agg(
            n_turns=("turn_idx", "size"),
            n_user=("role", lambda r: int((r == "user").sum())),
            n_assistant=("role", lambda r: int((r == "assistant").sum())),
            n_tool=("role", lambda r: int((r == "tool").sum())),
            first_ts=("ts", "min"),
            last_ts=("ts", "max"),
        )
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    for col in ("n_turns", "n_user", "n_assistant", "n_tool"):
        assert got[col].tolist() == want[col].tolist(), col
    assert got["first_ts"].astype("datetime64[us]").tolist() == want["first_ts"].astype("datetime64[us]").tolist()
    assert got["last_ts"].astype("datetime64[us]").tolist() == want["last_ts"].astype("datetime64[us]").tolist()


class TestResponseLatency:
    def test_lag_over_ordered_groups(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from texoo_ray.pipelines.conversations import response_latency

        ts = pd.to_datetime(
            [
                "2025-01-01 10:00:00", "2025-01-01 10:00:05",  # c1: user->assistant (5s)
                "2025-01-01 10:00:30", "2025-01-01 10:00:31",  # c1: user->tool (not a response)
                "2025-01-01 09:00:00",                          # c2: single turn
            ]
        )
        # rows deliberately out of turn order across blocks
        tbl = pa.table(
            {
                "conv_id": ["c1", "c1", "c1", "c1", "c2"],
                "turn_idx": pa.array([0, 1, 2, 3, 0], pa.int32()),
                "role": ["user", "assistant", "user", "tool", "user"],
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )
        out = (
            response_latency(ray.data.from_arrow(tbl).random_shuffle(seed=1).repartition(3))
            .to_pandas()
            .set_index("conv_id")
        )
        assert out.loc["c1", "n_turns"] == 4
        assert out.loc["c1", "n_responses"] == 1
        assert out.loc["c1", "sum_response_us"] == 5_000_000
        assert out.loc["c1", "sum_gap_us"] == 31_000_000  # 5s + 25s + 1s
        assert out.loc["c2", "n_responses"] == 0 and out.loc["c2", "sum_gap_us"] == 0


def test_context_windows(ray_session):
    import ray.data

    from texoo_ray.pipelines.conversations import context_windows

    turns = [
        # conv a: user, assistant, tool, assistant, assistant
        {"conv_id": "a", "turn_idx": 0, "role": "user", "text": "q1"},
        {"conv_id": "a", "turn_idx": 1, "role": "assistant", "text": "a1"},
        {"conv_id": "a", "turn_idx": 2, "role": "tool", "text": "t1"},
        {"conv_id": "a", "turn_idx": 3, "role": "assistant", "text": "a2"},
        {"conv_id": "a", "turn_idx": 4, "role": "assistant", "text": None},
        # conv b: assistant opener is skipped
        {"conv_id": "b", "turn_idx": 0, "role": "assistant", "text": "x"},
        {"conv_id": "b", "turn_idx": 1, "role": "user", "text": "y"},
    ]
    ds = ray.data.from_items(turns).repartition(3)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["context"], r["target"])
        for r in context_windows(ds, k=2).take_all()
    }
    assert got == {
        ("a", 1): ("user: q1", "a1"),
        ("a", 3): ("assistant: a1\ntool: t1", "a2"),
        ("a", 4): ("tool: t1\nassistant: a2", ""),
    }


def test_context_windows_k_window_and_cap(ray_session):
    import ray.data

    from texoo_ray.pipelines.conversations import context_windows

    turns = [
        {"conv_id": "c", "turn_idx": i, "role": "user" if i % 2 == 0 else "assistant",
         "text": f"t{i}"}
        for i in range(8)
    ]
    ds = ray.data.from_items(turns)
    got = {r["turn_idx"]: r["context"] for r in context_windows(ds, k=2).take_all()}
    # k=2: context is exactly the two preceding turns
    assert got[5] == "assistant: t3\nuser: t4"
    # cap truncates the conversation before window construction
    got_cap = {
        r["turn_idx"]: r["context"]
        for r in context_windows(ds, k=2, max_turns_per_group=4).take_all()
    }
    assert set(got_cap) == {1, 3}


class TestPreferencePairs:
    def test_vs_brute_force(self, ray_session):
        import re

        import ray.data

        from texoo_ray.pipelines.conversations import preference_pairs

        rows = [
            # conv a: two assistant turns, clear winner
            ("a", 0, "user", "hi"),
            ("a", 1, "assistant", "short"),
            ("a", 2, "user", "more?"),
            ("a", 3, "assistant", "a much longer detailed answer here"),
            # conv b: tie on score -> no pair
            ("b", 0, "assistant", "same same"),
            ("b", 1, "assistant", "same same"),
            # conv c: single assistant turn -> no pair
            ("c", 0, "assistant", "only one"),
            # conv d: tie-break — equal best scores, earliest turn wins
            ("d", 0, "assistant", "alpha beta"),
            ("d", 1, "assistant", "gamma delta"),
            ("d", 2, "assistant", "x"),
        ]
        tbl = pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = preference_pairs(ds).to_pandas()

        def score(t):
            w = re.findall(r"[a-z0-9]+", t.lower())
            return 1000 * len(set(w)) + len(w)

        # conv a: chosen = turn 3, rejected = turn 1
        # conv b: equal scores -> dropped; conv c: chosen == rejected -> dropped
        # conv d: turns 0 and 1 tie at the top -> chosen = 0; rejected = 2
        assert list(out["conv_id"]) == ["a", "d"]
        a = out.iloc[0]
        assert (a["chosen_idx"], a["rejected_idx"]) == (3, 1)
        assert a["chosen_score"] == score("a much longer detailed answer here")
        assert a["rejected_score"] == score("short")
        d = out.iloc[1]
        assert (d["chosen_idx"], d["rejected_idx"]) == (0, 2)
        # dtype preserved from the input turn column
        assert out["chosen_idx"].dtype == "int32"

    def test_score_col_and_empty(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.conversations import preference_pairs

        tbl = pa.table(
            {
                "conv_id": pa.array(["x", "x"], pa.string()),
                "turn_idx": pa.array([0, 1], pa.int32()),
                "role": pa.array(["assistant", "assistant"], pa.string()),
                "text": pa.array(["", ""], pa.string()),
                "s": pa.array([7, 3], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(tbl)
        out = preference_pairs(ds, score_col="s").to_pandas()
        assert len(out) == 1 and out.iloc[0]["chosen_idx"] == 0
        # no qualifying role rows at all
        ds2 = ray.data.from_arrow(
            pa.table(
                {
                    "conv_id": pa.array(["x"], pa.string()),
                    "turn_idx": pa.array([0], pa.int32()),
                    "role": pa.array(["user"], pa.string()),
                    "text": pa.array(["hi"], pa.string()),
                }
            )
        )
        assert preference_pairs(ds2).count() == 0


class TestToolChains:
    def test_vs_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.conversations import tool_chains

        rows = [
            # conv a: tool runs of length 2 then 1, two distinct tools
            ("a", 0, "user", ""),
            ("a", 1, "tool", "search"),
            ("a", 2, "tool", "search"),
            ("a", 3, "assistant", ""),
            ("a", 4, "tool", "calc"),
            # conv b: no tool turns at all
            ("b", 0, "user", ""),
            ("b", 1, "assistant", ""),
            # conv c: one long run, same tool repeated
            ("c", 0, "tool", "calc"),
            ("c", 1, "tool", "calc"),
            ("c", 2, "tool", "calc"),
        ]
        tbl = pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows], pa.string()),
                "tool": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = tool_chains(ds, n_buckets=4).to_pandas()
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == [
            ("a", 3, 2, 2),
            ("b", 0, 0, 0),
            ("c", 3, 3, 1),
        ]


class TestCollapseRetries:
    def test_vs_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.conversations import collapse_retries

        rows = [
            ("a", 0, "user", "hi"),
            ("a", 1, "user", "hi"),        # retry -> dropped
            ("a", 2, "assistant", "hello"),
            ("a", 3, "assistant", "hello"),  # retry -> dropped
            ("a", 4, "assistant", "hello again"),
            ("a", 5, "user", "hello again"),  # same text, new role -> kept
            ("b", 0, "user", "hi"),        # conv boundary -> kept
            ("b", 1, "user", None),        # null text
            ("b", 2, "user", ""),          # null == '' -> dropped
        ]
        tbl = pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = collapse_retries(ds, n_buckets=4).to_pandas()
        kept = list(zip(out["conv_id"], out["turn_idx"]))
        assert kept == [
            ("a", 0), ("a", 2), ("a", 4), ("a", 5), ("b", 0), ("b", 1),
        ]


class TestRepeatedAnswers:
    def test_vs_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.conversations import repeated_answers

        rows = [
            ("a", "assistant", "hello"),
            ("a", "user", "hello"),  # other role never counts
            ("a", "assistant", "world"),
            ("a", "assistant", "hello"),  # echo of turn 0
            ("a", "assistant", "hello"),  # and again
            ("b", "assistant", "unique"),
            ("c", "assistant", None),
            ("c", "assistant", ""),  # null == '' -> repeat
        ]
        tbl = pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "role": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = repeated_answers(ds).to_pandas()
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == [("a", 4, 2), ("b", 1, 0), ("c", 2, 1)]
