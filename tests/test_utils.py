"""Utility tests: meters, accuracy, logging, metrics writer."""

import logging

import numpy as np

from rlobjectdetection_tpu.utils import AveMeter, MetricsWriter, StepTimer, accuracy, init_log


def test_avemeter_sliding_window():
    m = AveMeter(window=3)
    for v in [1.0, 2.0, 3.0]:
        m.update(v)
    assert m.avg == 2.0
    m.update(4.0)  # window slides: [2, 3, 4]
    assert m.avg == 3.0
    assert m.val == 4.0
    m.reset()
    assert m.avg == 0.0


def test_accuracy_topk():
    # 4 samples, 3 classes
    out = np.array(
        [[0.1, 0.8, 0.1],   # pred 1
         [0.7, 0.2, 0.1],   # pred 0
         [0.2, 0.3, 0.5],   # pred 2
         [0.4, 0.35, 0.25]] # pred 0
    )
    target = np.array([1, 0, 0, 2])
    top1, top2 = accuracy(out, target, topk=(1, 2))
    assert abs(top1 - 50.0) < 1e-9      # samples 0, 1 correct
    assert abs(top2 - 50.0) < 1e-9      # no extra hits in top-2


def test_init_log_rank_format():
    log = init_log("test_logger_xyz")
    assert log.level == logging.INFO
    # the handler formats records with the rank prefix (rk0 single-process)
    record = logging.LogRecord("test_logger_xyz", logging.INFO, __file__, 1,
                               "hello", None, None)
    assert log.handlers, "init_log must attach a stream handler"
    formatted = log.handlers[0].format(record)
    assert formatted.startswith("rk0 ") and formatted.endswith("hello")
    # the rank filter admits rank 0 (single-process) — and repeat init_log
    # must not stack handlers/filters
    assert log.filters and log.filters[0](record)
    again = init_log("test_logger_xyz")
    assert len(again.handlers) == 1 and len(again.filters) == 1


def test_metrics_writer_noop(tmp_path):
    w = MetricsWriter(str(tmp_path / "tb"))
    w.scalar_summary("loss", 1.0, 1)     # must not raise either way
    w.close()


def test_step_timer():
    t = StepTimer()
    t.tic()
    assert t.toc() >= 0.0
