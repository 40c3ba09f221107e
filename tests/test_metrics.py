"""AsyncMetricsLogger unit tests (SURVEY.md R5, §5.5).

The throughput stamp must not be fooled by queue backlogs: on this
platform dispatched steps execute in bursts, so backlogged items fetch
milliseconds apart and a naive inter-fetch rate reads ~100-1000x too
fast (observed: 3540 "steps/sec" on a run whose wall rate was 4.4).
"""

import json
import os

import numpy as np

from colvo.runtime.metrics import AsyncMetricsLogger, MetricsWriter


def _drain_rows(log_dir):
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        return [json.loads(line) for line in f]


def test_sps_skipped_on_backlog(tmp_path):
    writer = MetricsWriter(str(tmp_path), also_stdout=False)
    logger = AsyncMetricsLogger(writer)
    t = 100.0
    # Item 1 processed at some wall time T1 (= now). Item 2 was enqueued
    # long before T1 (enq_t far in the past => backlog): no sps stamp.
    logger._process((500, t, {"loss/total": np.float32(1.0)}))
    logger._process((1000, t + 0.001, {"loss/total": np.float32(1.0)}))
    logger._q.put(None)
    logger._thread.join()
    writer.close()
    rows = _drain_rows(str(tmp_path))
    assert len(rows) == 2
    assert "steps_per_sec" not in rows[1], rows[1]


def test_sps_stamped_when_waiting(tmp_path):
    import time

    writer = MetricsWriter(str(tmp_path), also_stdout=False)
    logger = AsyncMetricsLogger(writer, fps_scale=12.0)
    logger._process((500, time.time(), {"loss/total": np.float32(1.0)}))
    time.sleep(0.05)
    # Enqueued after the previous fetch completed => the thread was
    # idle-waiting; the gap is honest wall clock.
    logger._process((1000, time.time(), {"loss/total": np.float32(1.0)}))
    logger._q.put(None)
    logger._thread.join()
    writer.close()
    rows = _drain_rows(str(tmp_path))
    sps = rows[1]["steps_per_sec"]
    assert 0 < sps <= 500 / 0.05 * 1.1, sps
    assert rows[1]["fps"] == sps * 12.0


def test_nan_guard_counts_consecutive(tmp_path):
    writer = MetricsWriter(str(tmp_path), also_stdout=False)
    logger = AsyncMetricsLogger(writer)
    t = 100.0
    logger._process((1, t, {"loss/total": np.float32(np.nan)}))
    logger._process((2, t, {"loss/total": np.float32(np.nan)}))
    assert logger.bad_steps == 2
    logger._process((3, t, {"loss/total": np.float32(0.5)}))
    assert logger.bad_steps == 0
    logger._q.put(None)
    logger._thread.join()
    writer.close()
