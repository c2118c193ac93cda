"""Unit tests for bench.py's result-of-record protection (VERDICT r3 weak
#1: a compile-poisoned provisional line became the round's official number
under the "last complete line is the record" contract). These exercise the
best-so-far holder and the watchdog/abort re-emission without any device
work, so they live in the fast suite."""

import json


def _reset(bench):
    bench._BEST["line"], bench._BEST["rank"] = None, -1


def test_emit_rank_tracking():
    import bench

    _reset(bench)
    bench.emit({"metric": "m", "value": 3.9, "provisional": True}, rank=1)
    assert bench._BEST["line"]["value"] == 3.9

    # a later provisional replaces an earlier one (same rank, newer wins)
    bench.emit({"metric": "m", "value": 4.1, "provisional": True}, rank=1)
    assert bench._BEST["line"]["value"] == 4.1

    # the measured line supersedes provisionals
    bench.emit({"metric": "m", "value": 4.5}, rank=2)
    assert bench._BEST["line"]["value"] == 4.5
    assert bench._BEST["rank"] == 2

    # a provisional can never displace a measured line
    bench.emit({"metric": "m", "value": 0.08, "provisional": True}, rank=1)
    assert bench._BEST["line"]["value"] == 4.5

    # enriched re-emits of the measured result keep replacing
    bench.emit({"metric": "m", "value": 4.5, "pallas_check": "ok"}, rank=2)
    assert bench._BEST["line"]["pallas_check"] == "ok"


def test_reemit_best_makes_last_line_the_record(capsys):
    import bench

    _reset(bench)
    bench.emit({"metric": "m", "value": 3.9, "provisional": True}, rank=1)
    # simulate the r3 failure shape: watchdog fires after only provisional
    # lines were flushed — the re-emission must repeat the best provisional
    # so the LAST line is the best-quality number known
    bench.reemit_best()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert lines[-1]["value"] == 3.9

    bench.emit({"metric": "m", "value": 4.5}, rank=2)
    bench.emit({"metric": "m", "value": 0.1, "provisional": True}, rank=1)
    bench.reemit_best()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert lines[-1]["value"] == 4.5


def test_reemit_best_noop_when_nothing_flushed(capsys):
    import bench

    _reset(bench)
    bench.reemit_best()
    assert capsys.readouterr().out == ""
