"""bench.py noise-control rules (VERDICT r5 item 2).

The median-of-5 set must derive from the two newest committed BENCH
files — in BOTH formats that exist on disk (bench.py's raw JSON line
and the round driver's wrapper with the line under "parsed") — and
_previous_bench_times must read the newest PRIOR-ROUND file for the
in-run escalation rule (a same-round trial refresh must not become
its own comparison base).  Pure unit tests (no Spark)."""

from __future__ import annotations

import importlib.util
import json
import os


def _bench_module():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location("bench", os.path.join(here, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_auto_median5_flags_both_directions(tmp_path, monkeypatch):
    m = _bench_module()
    raw = {"queries": {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0}}
    wrapped = {
        "n": "5",
        "parsed": {"queries": {"a": 1.3, "b": 0.7, "c": 1.1, "e": 9.9}},
    }
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(raw))
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(wrapped))
    monkeypatch.setattr(
        os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    got = m._auto_median5_keys()
    # a regressed +30%, b improved -30% -> both flagged; c moved 10% ->
    # not flagged; d/e lack a pair -> not flagged
    assert got == {"a", "b"}


def test_previous_bench_times_reads_newest_wrapped(tmp_path, monkeypatch):
    m = _bench_module()
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"queries": {"x": 5.0}}))
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": {"queries": {"x": 2.0}}})
    )
    monkeypatch.setattr(os.path, "abspath", lambda p: str(tmp_path / "bench.py"))
    assert m._previous_bench_times() == {"x": 2.0}


def test_bench_queries_tolerates_garbage(tmp_path):
    m = _bench_module()
    p = tmp_path / "BENCH_bad.json"
    p.write_text("{not json")
    assert m._bench_queries(str(p)) == {}
    assert m._bench_queries(str(tmp_path / "missing.json")) == {}
    p2 = tmp_path / "BENCH_list.json"
    p2.write_text(json.dumps({"queries": [1, 2]}))
    assert m._bench_queries(str(p2)) == {}


def test_bench_files_sort_by_round_number(tmp_path, monkeypatch):
    """Lexicographic filename sort breaks at r100 ('BENCH_r100' <
    'BENCH_r11'); the newest-round pick must use the parsed round
    number (review finding r6)."""
    m = _bench_module()
    for r, x in [(9, 1.0), (11, 2.0), (100, 3.0)]:
        (tmp_path / f"BENCH_r{r:02d}.json").write_text(
            json.dumps({"queries": {"x": x}})
        )
    monkeypatch.setattr(os.path, "abspath", lambda p: str(tmp_path / "bench.py"))
    assert m._previous_bench_times() == {"x": 3.0}  # r100 is newest
    # median5 derivation compares r100 vs r11 (x: 2.0 -> 3.0 = +50%)
    assert m._auto_median5_keys() == {"x"}


def test_round_records_prefer_self_and_skip_truncated(tmp_path, monkeypatch):
    """A round whose driver artifact was tail-truncated ("parsed": null,
    observed r7) must not poison the comparisons: its self-artifact is
    preferred when present, and the round is skipped entirely when not
    (VERDICT r7 item 1)."""
    m = _bench_module()
    (tmp_path / "BENCH_r06.json").write_text(json.dumps({"queries": {"x": 1.0}}))
    # r7: driver truncated, no self-artifact -> round skipped
    (tmp_path / "BENCH_r07.json").write_text(json.dumps({"parsed": None, "tail": "{bro"}))
    # r8: driver truncated BUT self-artifact present -> self wins
    (tmp_path / "BENCH_r08.json").write_text(json.dumps({"parsed": None}))
    (tmp_path / "BENCH_SELF_r08.json").write_text(
        json.dumps({"queries": {"x": 2.0}, "methods": {"x": {"method": "best3"}}})
    )
    monkeypatch.setattr(os.path, "abspath", lambda p: str(tmp_path / "bench.py"))
    assert m._round_records() == [(6, {"x": 1.0}), (8, {"x": 2.0})]
    assert m._previous_bench_times() == {"x": 2.0}
    # +-25% rule compares r8's self record against r6 (r7 unusable)
    assert m._auto_median5_keys() == {"x"}
    assert m._next_round() == 9


def test_stdout_summary_line_fits_tail_capture():
    """The compact stdout record (no methods) must stay well under the
    round driver's ~2000-char tail window at the CURRENT headline size
    — the r7 artifact was lost to exactly this overflow.  Mirror the
    slim stdout copy (centisecond walls, no constant budget field) and
    upper-bound every wall at 99.99 s (no headline key has ever
    exceeded 10 s; one over 100 s would be a perf red flag caught by
    its own row)."""
    m = _bench_module()
    # TRUE worst case per key: the widest value _slim_wall can emit is
    # 4 chars ("0.99" — the centisecond cap closes the 5-char "0.092"
    # case; values >= 10 collapse to <=3-char ints), so model EVERY
    # wall at that width.  At r11 the headline reached 74 keys and the
    # uncapped worst case passed 1900 — the stdout copy now runs through
    # _capped_stdout_queries, which drops OLDEST-history keys first
    # until the map fits (the full map always lives in BENCH_SELF).
    times = {k: 0.99 for k in m.HEADLINE}
    times["gstream_epoch_20x100"] = 0.99
    times["gstream_estep_distributed"] = 0.99
    # Model the variable-width storm extras at their widest (8 steal
    # entries on the longest key names, 5 truncated retry names +
    # count) — main() debits their serialized length from the queries
    # budget, so the modeled line must carry both at worst case.
    long_names = sorted(m.HEADLINE, key=len, reverse=True)
    extras = {
        "retry_skipped": long_names[:5],
        "retry_skipped_n": 99,
        "steal": {k: 99999999 for k in long_names[5:13]},
    }
    extras_len = len(json.dumps(extras, separators=(",", ":")))
    capped = m._capped_stdout_queries(
        times, budget=m._STDOUT_QUERIES_BUDGET - extras_len
    )
    assert all(len(json.dumps(v)) <= 4 for v in capped.values())
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": 999999.999,
            "unit": "sec",
            "queries": capped,
            "sf": 0.1,
            "gstream_ms_per_batch": 9999.9,
            "estep_points_per_sec": 99999999,
            **extras,
            # truncation marker (ADVICE r11) at its widest plausible
            # value — it is part of the modeled stdout budget
            "q_dropped": 999,
        },
        separators=(",", ":"),
    )
    assert len(line) < 1900, len(line)
    # the NEWEST keys keep their stdout slot; only older keys may be
    # dropped, and the two gstream extras always survive
    tail_keys = list(m.HEADLINE)[-5:]
    assert all(k in capped for k in tail_keys)
    assert "gstream_epoch_20x100" in capped
    assert "gstream_estep_distributed" in capped
    dropped = [k for k in times if k not in capped]
    assert dropped == list(m.HEADLINE)[: len(dropped)]


def test_capped_stdout_rotation_covers_every_key_in_two_rounds():
    """VERDICT r13 item 2: the shed set must ROTATE so every headline
    key is driver-witnessed at least once in any two consecutive
    rounds (fixed oldest-first shedding left 25 keys permanently
    invisible)."""
    m = _bench_module()
    times = {k: 0.99 for k in m.HEADLINE}
    times["gstream_epoch_20x100"] = 0.99
    times["gstream_estep_distributed"] = 0.99
    even = m._capped_stdout_queries(times, shed_salt=14)
    odd = m._capped_stdout_queries(times, shed_salt=15)
    # both parities shed something at the current headline size
    assert len(even) < len(times) and len(odd) < len(times)
    # even rounds shed oldest-first (the historical behavior)
    dropped_even = [k for k in times if k not in even]
    assert dropped_even == list(m.HEADLINE)[: len(dropped_even)]
    # the two windows are disjoint: every key survives in at least one
    # of any two consecutive rounds
    assert set(times) == set(even) | set(odd)
    # the derived gstream rows and the 5 newest keys survive BOTH
    for k in list(m.HEADLINE)[-5:] + [
        "gstream_epoch_20x100",
        "gstream_estep_distributed",
    ]:
        assert k in even and k in odd


def test_slim_wall_two_significant_digits():
    """2 significant digits CAPPED at centiseconds: sub-0.1 walls would
    otherwise render 5+ chars ("0.025") and break the worst-case width
    bound the tail-line guard models."""
    m = _bench_module()
    assert m._slim_wall(61.437) == 61.0
    assert m._slim_wall(1.278) == 1.3
    assert m._slim_wall(0.0254) == 0.03
    assert m._slim_wall(0.926) == 0.93
    assert m._slim_wall(99.99) == 100.0
    assert all(
        len(json.dumps(m._slim_wall(v))) <= 4
        for v in (0.0049, 0.092, 0.926, 1.278, 9.99)
    )


def test_trimmed_tier_guards_burst_dominated_medians(tmp_path, monkeypatch):
    """The r9 exhibit: embed_pq_codes' driver samples [2.1, 15.9, 14.2,
    7.2, 2.4] put a 7.2 s median on a key whose recorded floor is
    ~0.64 s — >= 5x apart, so the robust center must downgrade to the
    mean of the 3 smallest samples.  Tight samples (real uniform
    slowdowns) must keep the plain median, and a key with no recorded
    floor must too."""
    m = _bench_module()
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"queries": {"embed_pq_codes": 0.64}})
    )
    monkeypatch.setattr(os.path, "abspath", lambda p: str(tmp_path / "bench.py"))
    floors = m._recorded_floors()
    assert floors == {"embed_pq_codes": 0.64}

    burst = [2.1, 15.9, 14.2, 7.2, 2.4]
    v, how = m._robust_center(burst, floors.get("embed_pq_codes"))
    assert how == "trimmed3of5-floorguard"
    assert v == round((2.1 + 2.4 + 7.2) / 3, 3)  # well below the 7.2 median
    # tight samples: median survives even with an old fast floor,
    # because a REAL regression moves the fast samples too -> median
    # only trips the guard when >= 5x the floor
    v2, how2 = m._robust_center([1.5, 1.4, 1.6, 1.5, 1.5], 0.64)
    assert (v2, how2) == (1.5, "median5")
    # genuinely 5x-slower across ALL samples: trimmed mean ~= median,
    # so the guard cannot hide a real uniform slowdown
    v3, how3 = m._robust_center([3.3, 3.2, 3.4, 3.3, 3.3], 0.64)
    assert how3 == "trimmed3of5-floorguard"
    assert abs(v3 - 3.3) < 0.05
    # no recorded floor -> plain median
    v4, how4 = m._robust_center(burst, None)
    assert (v4, how4) == (7.2, "median5")


def test_recorded_floors_take_min_across_rounds(tmp_path, monkeypatch):
    m = _bench_module()
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"queries": {"x": 2.0}}))
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": {"queries": {"x": 0.5, "y": 3.0}}})
    )
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({"queries": {"x": 1.0}}))
    monkeypatch.setattr(os.path, "abspath", lambda p: str(tmp_path / "bench.py"))
    assert m._recorded_floors() == {"x": 0.5, "y": 3.0}


def test_committed_bench_files_parse():
    """The newest USABLE committed round record must yield per-key walls
    (driver-truncated artifacts are tolerated — the reader skips them,
    VERDICT r7 item 1 — but at least one round must be recoverable)."""
    m = _bench_module()
    records = m._round_records()
    assert records, "no usable committed BENCH records"
    rnd, q = records[-1]
    assert isinstance(q, dict) and len(q) > 10
    assert all(isinstance(v, (int, float)) for v in q.values())


def test_load_stamp_shape():
    """The host-load stamp (VERDICT r11 item 2) must expose loadavg and
    steal ticks on this Linux container so committed artifacts are
    self-adjudicating about host noise."""
    m = _bench_module()
    s = m._load_stamp()
    assert "load1" in s and isinstance(s["load1"], float)
    # /proc/stat steal field exists on Linux; value is a raw counter
    assert "steal" in s and isinstance(s["steal"], int) and s["steal"] >= 0
    # deltas across a burst are computable (monotone counter)
    assert m._cpu_steal_ticks() >= s["steal"]


def test_r11_steal_movers_are_median5_or_converged():
    """VERDICT r11 item 2's standing contract: every r10->r11 >25%
    mover is EITHER measured median-of-5-class in the newest committed
    self-artifact (the derivation fired) OR its two newest usable
    records agree within 25% (the documented self-clear: once a key's
    value is stable across two rounds it drops back to adaptive
    best-of-N).  A key that is neither would mean a steal-suspect
    wall shipped on a thin sample — the exact failure BENCH_r11
    exhibited."""
    import glob
    import re

    m = _bench_module()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    selfs = glob.glob(os.path.join(here, "BENCH_SELF_r*.json"))
    assert selfs
    newest = max(
        selfs,
        key=lambda p: int(re.search(r"_r(\d+)", os.path.basename(p)).group(1)),
    )
    with open(newest) as f:
        methods = json.load(f)["methods"]
    records = m._round_records()
    assert len(records) >= 2
    prev, last = records[-2][1], records[-1][1]
    for key in (
        "ann_lsh_bucketed",
        "join_size_estimate",
        "bloom_join_prune",
        "dedup_simhash_hamming",
        "table_content_checksum",
        "quality_repetition",
        "vector_sum_agg",
    ):
        method = methods[key]["method"]
        robust = "median5" in method or "trimmed" in method
        converged = (
            key in prev
            and key in last
            and prev[key] > 0
            and abs(last[key] - prev[key]) / prev[key] <= 0.25
        )
        assert robust or converged, (key, method, prev.get(key), last.get(key))


def test_quiet_retry_plan_caps_and_orders(tmp_path):
    """ADVICE r12: the end-of-run quiet retry is budget-capped,
    worst-ratio-first, always retries the headline mover, and reports
    the skipped tail instead of silently dropping it."""
    m = _bench_module()
    prev = {"a": 1.0, "b": 1.0, "c": 10.0, "d": 1.0, "e": 1.0}
    times = {"a": 2.0, "b": 1.5, "c": 40.0, "d": 1.1, "e": 0.9}
    # movers: c (4.0x), a (2.0x), b (1.5x); d (+10%) and e (improved)
    # are not movers.  Budget 120s: c costs 5*40=200 > 120 but is the
    # worst mover so it is retried anyway; a and b are then over
    # budget and skipped, in mover order.
    retry, skipped = m._quiet_retry_plan(times, prev, budget_s=120.0)
    assert retry == ["c"]
    assert skipped == ["a", "b"]
    # Ample budget: everyone retries, worst-first, nothing skipped.
    retry, skipped = m._quiet_retry_plan(times, prev, budget_s=1e9)
    assert retry == ["c", "a", "b"] and skipped == []
    # No previous record (first round): no movers, no retries.
    assert m._quiet_retry_plan(times, {}) == ([], [])
    # Partial budget (cheap movers cost 3 samples, VERDICT r13 item 1):
    # c costs 5*40=200, a 3*2=6 (fits at 206 <= 208), b 3*1.5=4.5
    # (210.5 > 208 -> skipped).
    retry, skipped = m._quiet_retry_plan(times, prev, budget_s=208.0)
    assert retry == ["c", "a"] and skipped == ["b"]
    # The DEFAULT budget scales with the run: max(300, 0.5 * total
    # wall), so a storm that inflates many keys inflates the budget
    # with them instead of silencing the retry pass.
    big = {k: 100.0 for k in ("a", "b", "c", "d", "e", "f", "g", "h")}
    prev_big = {k: 1.0 for k in big}
    retry, skipped = m._quiet_retry_plan(big, prev_big)  # budget 400
    assert retry == ["a", "b", "c", "d", "e", "f", "g", "h"][: len(retry)]
    assert len(retry) == 1 or sum(5 * 100.0 for _ in retry) <= 400.0
    assert m._retry_samples(0.5) == 3 and m._retry_samples(9.0) == 5


def test_previous_bench_times_excludes_same_round_trial(tmp_path, monkeypatch):
    """r13 escalation gap: with a same-round BENCH_SELF trial on disk
    (the refresh protocol), the +-25% comparison base must STILL be the
    newest prior-round record — otherwise a round-over-round mover
    whose first trial already absorbed the jump ships on best-of-N
    (bloom_join_prune, +33% vs r12, method best2)."""
    m = _bench_module()
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"queries": {"a": 1.0, "b": 2.0}})
    )
    # current round's own trial refresh: round 3 self-artifact
    (tmp_path / "BENCH_SELF_r03.json").write_text(
        json.dumps({"_round_base": 2, "queries": {"a": 1.6, "b": 2.1}})
    )
    monkeypatch.setattr(
        os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    assert m._latest_driver_round() == 2
    prev = m._previous_bench_times()
    assert prev["a"] == 1.0  # prior round, NOT the same-round trial
