"""Structured timing registry."""

import json

from pixelbox_tpu.utils import timing


def test_timed_records_stats():
    timing.reset_stats()
    with timing.timed("unit.test_scope"):
        pass
    with timing.timed("unit.test_scope"):
        pass
    stats = timing.get_stats()
    assert stats["unit.test_scope"]["count"] == 2
    assert stats["unit.test_scope"]["total_s"] >= 0


def test_dump_is_json():
    timing.reset_stats()
    with timing.timed("unit.json_scope"):
        pass
    parsed = json.loads(timing.dump_stats())
    assert "unit.json_scope" in parsed


def test_reset():
    with timing.timed("unit.reset_scope"):
        pass
    timing.reset_stats()
    assert timing.get_stats() == {}
