"""ZMQ training control/progress callbacks (reference sleap/nn/callbacks.py:
TrainingControllerZMQ:18, ProgressReporterZMQ:69)."""

import json
import time

import pytest

zmq = pytest.importorskip("zmq")

from sleap_tpu.training.callbacks import ProgressReporterZMQ, TrainingControllerZMQ


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_progress_reporter_events():
    port = _free_port()
    reporter = ProgressReporterZMQ(f"tcp://127.0.0.1:{port}")
    ctx = zmq.Context()
    sub = ctx.socket(zmq.SUB)
    sub.setsockopt_string(zmq.SUBSCRIBE, "")
    sub.connect(f"tcp://127.0.0.1:{port}")
    time.sleep(0.2)  # PUB/SUB join

    reporter.epoch_begin(0)
    reporter.batch_end(0, 3, 0.5)
    reporter.epoch_end(0, 0.5, 0.6)

    got = []
    for _ in range(3):
        assert sub.poll(2000, zmq.POLLIN)
        got.append(json.loads(sub.recv_string()))
    assert [m["what"] for m in got] == ["epoch_begin", "batch_end", "epoch_end"]
    assert got[1]["logs"]["loss"] == 0.5
    assert got[2]["logs"]["val_loss"] == 0.6

    reporter.close()
    sub.close()
    ctx.term()


def _controller_pair():
    port = _free_port()
    ctx = zmq.Context()
    pub = ctx.socket(zmq.PUB)
    pub.bind(f"tcp://127.0.0.1:{port}")
    controller = TrainingControllerZMQ(f"tcp://127.0.0.1:{port}", timeout=100)
    time.sleep(0.2)
    return ctx, pub, controller


def test_controller_stop_command():
    ctx, pub, controller = _controller_pair()
    pub.send_string(json.dumps({"command": "stop"}))
    deadline = time.time() + 2
    result = None
    while time.time() < deadline and result is None:
        result = controller.poll()
    assert result == "stop"
    controller.socket.close()
    pub.close()
    ctx.term()


def test_controller_set_lr_is_recorded_and_consumed():
    ctx, pub, controller = _controller_pair()
    pub.send_string(json.dumps({"command": "set_lr", "lr": "1e-5"}))
    deadline = time.time() + 2
    while time.time() < deadline and controller.requested_lr is None:
        controller.poll()
    assert controller.requested_lr == pytest.approx(1e-5)
    assert controller.take_requested_lr() == pytest.approx(1e-5)
    assert controller.take_requested_lr() is None  # consumed

    # Malformed lr is ignored, not fatal.
    pub.send_string(json.dumps({"command": "set_lr", "lr": "not-a-number"}))
    deadline = time.time() + 1
    while time.time() < deadline:
        controller.poll()
        if controller.requested_lr is not None:
            break
    assert controller.requested_lr is None
    controller.socket.close()
    pub.close()
    ctx.term()
