"""Stream-health watchdog and drop accounting."""

import time

from bugcar_image_segmentation_tpu.io import DropCounter, StallWatchdog


class TestStallWatchdog:
    def test_detects_stall_and_recovers(self):
        events = []
        wd = StallWatchdog(stall_after_s=0.2, poll_s=0.05,
                           on_stall=lambda age: events.append(age)).start()
        try:
            # healthy ticking: no stall
            for _ in range(6):
                wd.tick()
                time.sleep(0.05)
            assert wd.stall_count == 0 and not wd.stalled
            # stop ticking: stall fires once
            time.sleep(0.5)
            assert wd.stall_count == 1 and wd.stalled
            assert events and events[0] >= 0.2
            # ticking again re-arms
            wd.tick()
            time.sleep(0.1)
            assert not wd.stalled
            time.sleep(0.5)
            assert wd.stall_count == 2
        finally:
            wd.stop()

    def test_stop_idempotent(self):
        wd = StallWatchdog(stall_after_s=10).start()
        wd.stop()
        wd.stop()


class TestDropCounter:
    def test_rates(self):
        d = DropCounter()
        d.record(0)
        d.record(3)
        assert d.frames == 2 and d.dropped == 3
        assert abs(d.drop_rate - 3 / 5) < 1e-9

    def test_empty(self):
        assert DropCounter().drop_rate == 0.0
