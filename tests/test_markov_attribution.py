"""Independent-reference check for the Markov removal-effect
attribution: the Spark value iteration (micro-gridded) must agree
with a pure-Python dense replay of the same truncated recurrence,
and with closed-form absorption probabilities on journeys simple
enough to solve by hand."""

from __future__ import annotations

import datetime as dt
import math

from stream_processing_system_spark.plans.analytics import (
    MARKOV_CHANNELS,
    MARKOV_ROUNDS,
    markov_attribution_from_events,
)


def _mk_events(spark, journeys):
    """journeys: list of (user_id, [event_type, ...])."""
    rows = []
    eid = 0
    for uid, seq in journeys:
        for i, et in enumerate(seq):
            rows.append(
                (eid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), uid, et)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _python_reference(journeys):
    """Dense replay: build transitions exactly as the operator
    defines them, then run MARKOV_ROUNDS value-iteration rounds with
    per-term floor(1e9) gridding — floats via the same IEEE ops."""
    trans: dict[tuple[str, str], int] = {}

    def bump(s, t):
        trans[(s, t)] = trans.get((s, t), 0) + 1

    for _uid, seq in journeys:
        fp = seq.index("purchase") if "purchase" in seq else None
        journey = [e for i, e in enumerate(seq) if e != "purchase" and (fp is None or i < fp)]
        if not journey:
            if fp is not None:
                bump("START", "CONV")
            continue
        bump("START", journey[0])
        for a, b in zip(journey, journey[1:]):
            bump(a, b)
        bump(journey[-1], "CONV" if fp is not None else "DROP")

    outsum: dict[str, int] = {}
    for (s, _t), n in trans.items():
        outsum[s] = outsum.get(s, 0) + n
    p = {(s, t): n / outsum[s] for (s, t), n in trans.items()}

    states = ["START", *MARKOV_CHANNELS]
    out = {}
    for removed in ["(none)", *MARKOV_CHANNELS]:
        q = {s: 0 for s in states}
        for _ in range(MARKOV_ROUNDS):
            nq = {}
            for s in states:
                tot = 0
                for t in [*states, "CONV", "DROP"]:
                    if (s, t) not in p:
                        continue
                    if t == "CONV":
                        u = 1000000000
                    elif t == "DROP" or t == removed:
                        u = 0
                    else:
                        u = q[t]
                    tot += math.floor(p[(s, t)] * (u / 1e9) * 1e9 + 0.5)
                nq[s] = tot
            q = nq
        out[removed] = q["START"]
    return out


JOURNEYS = [
    (1, ["click", "purchase"]),
    (2, ["view", "click", "purchase"]),
    (3, ["view"]),
    (4, ["purchase"]),
    (5, ["signup", "view", "view", "purchase", "click"]),
    (6, ["error", "click"]),
    (7, ["click", "view"]),
    (8, ["view", "purchase", "purchase"]),
]


def test_matches_python_dense_replay(spark):
    got = {
        r["channel"]: r
        for r in markov_attribution_from_events(_mk_events(spark, JOURNEYS)).collect()
    }
    ref = _python_reference(JOURNEYS)
    assert math.isclose(got["click"]["conv_base"], ref["(none)"] / 1e9, abs_tol=0)
    for c in MARKOV_CHANNELS:
        assert got[c]["conv_without"] == ref[c] / 1e9, c
        assert got[c]["removal_effect"] == (ref["(none)"] - ref[c]) / 1e9, c


def test_hand_solvable_chain(spark):
    """Two disjoint one-hop journeys: click→purchase and view→DROP.
    P(conv)=1/2 via click only; removing click drops conversion to 0,
    removing view changes nothing → click gets 100% of the credit."""
    journeys = [(1, ["click", "purchase"]), (2, ["view"])]
    got = {
        r["channel"]: r
        for r in markov_attribution_from_events(_mk_events(spark, journeys)).collect()
    }
    assert got["click"]["conv_base"] == 0.5
    assert got["click"]["conv_without"] == 0.0
    assert got["click"]["attribution"] == 1.0
    assert got["view"]["conv_without"] == 0.5
    assert got["view"]["removal_effect"] == 0.0


def _python_shapley(journeys):
    """Exact Shapley from the same gridded coalition replay: v(S) via
    the dense value iteration with channels outside S absorbing."""
    import itertools

    trans: dict[tuple[str, str], int] = {}

    def bump(s, t):
        trans[(s, t)] = trans.get((s, t), 0) + 1

    for _uid, seq in journeys:
        fp = seq.index("purchase") if "purchase" in seq else None
        journey = [
            e for i, e in enumerate(seq)
            if e != "purchase" and (fp is None or i < fp)
        ]
        if not journey:
            if fp is not None:
                bump("START", "CONV")
            continue
        bump("START", journey[0])
        for a, b in zip(journey, journey[1:]):
            bump(a, b)
        bump(journey[-1], "CONV" if fp is not None else "DROP")
    outsum: dict[str, int] = {}
    for (s, _t), n in trans.items():
        outsum[s] = outsum.get(s, 0) + n
    p = {(s, t): n / outsum[s] for (s, t), n in trans.items()}
    states = ["START", *MARKOV_CHANNELS]

    def v(allowed: frozenset) -> int:
        q = {s: 0 for s in states}
        for _ in range(MARKOV_ROUNDS):
            nq = {}
            for s in states:
                tot = 0
                for t in [*states, "CONV", "DROP"]:
                    if (s, t) not in p:
                        continue
                    if t == "CONV":
                        u = 1000000000
                    elif t == "DROP" or t not in allowed:
                        u = 0
                    else:
                        u = q[t]
                    tot += math.floor(p[(s, t)] * (u / 1e9) * 1e9 + 0.5)
                nq[s] = tot
            q = nq
        return q["START"]

    n = len(MARKOV_CHANNELS)
    fact = math.factorial
    vals = {}
    for r in range(n + 1):
        for s in itertools.combinations(MARKOV_CHANNELS, r):
            vals[frozenset(s)] = v(frozenset(s))
    phi = {}
    for c in MARKOV_CHANNELS:
        tot = 0.0
        rest = [x for x in MARKOV_CHANNELS if x != c]
        for r in range(n):
            for s in itertools.combinations(rest, r):
                fs = frozenset(s)
                w = fact(r) * fact(n - r - 1) / fact(n)
                tot += w * float(vals[fs | {c}] - vals[fs])
        phi[c] = tot
    return vals, phi


def test_shapley_matches_python_and_is_efficient(spark):
    from stream_processing_system_spark.plans.analytics import (
        shapley_attribution_from_events,
    )

    got = {
        r["channel"]: r
        for r in shapley_attribution_from_events(
            _mk_events(spark, JOURNEYS)
        ).collect()
    }
    vals, phi = _python_shapley(JOURNEYS)
    full = frozenset(MARKOV_CHANNELS)
    for c in MARKOV_CHANNELS:
        assert abs(got[c]["shapley_value"] - phi[c] / 1e9) < 1e-12, c
        assert got[c]["conv_full"] == vals[full] / 1e9
    # efficiency: Σφ == v(full) − v(∅) up to grid noise (the operator
    # reports the residual — it must be tiny)
    assert abs(got["click"]["efficiency_gap"]) < 1e-6
    # null player: a channel appearing in no journey gets zero credit
    journeys = [(1, ["click", "purchase"]), (2, ["view"])]
    got2 = {
        r["channel"]: r
        for r in shapley_attribution_from_events(
            _mk_events(spark, journeys)
        ).collect()
    }
    assert got2["error"]["shapley_value"] == 0.0
    assert got2["signup"]["shapley_value"] == 0.0
    assert got2["click"]["shapley_value"] > 0.0
