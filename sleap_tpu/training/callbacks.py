"""Training progress/control channels.

Rebuild of ``/root/reference/sleap/nn/callbacks.py``
(``TrainingControllerZMQ:18``, ``ProgressReporterZMQ:69``): a ZMQ PUB socket
broadcasting batch/epoch events (consumed by GUI loss viewers) and a SUB
socket accepting ``stop`` / ``set_lr`` commands. Both are optional and fail
soft if pyzmq is unavailable.
"""

from __future__ import annotations

import json
import logging
from typing import Optional

logger = logging.getLogger(__name__)


class ProgressReporterZMQ:
    """PUB socket emitting training progress events (callbacks.py:69)."""

    def __init__(self, address: str = "tcp://127.0.0.1:9001"):
        import zmq

        self.context = zmq.Context()
        self.socket = self.context.socket(zmq.PUB)
        self.socket.bind(address)

    def _send(self, what: str, **kwargs) -> None:
        self.socket.send_string(json.dumps({"what": what, **kwargs}))

    def epoch_begin(self, epoch: int) -> None:
        self._send("epoch_begin", epoch=epoch)

    def batch_end(self, epoch: int, batch: int, loss: float) -> None:
        self._send("batch_end", epoch=epoch, batch=batch, logs={"loss": loss})

    def epoch_end(self, epoch: int, loss: float, val_loss: float) -> None:
        self._send("epoch_end", epoch=epoch, logs={"loss": loss, "val_loss": val_loss})

    def close(self) -> None:
        self._send("train_end")
        self.socket.close()
        self.context.term()


class TrainingControllerZMQ:
    """SUB socket polling for remote control commands (callbacks.py:18)."""

    def __init__(self, address: str = "tcp://127.0.0.1:9000", timeout: int = 10):
        import zmq

        self.context = zmq.Context()
        self.socket = self.context.socket(zmq.SUB)
        self.socket.setsockopt_string(zmq.SUBSCRIBE, "")
        self.socket.connect(address)
        self.timeout = timeout
        #: Pending remote learning-rate request; the trainer consumes (and
        #: clears) it at the next poll site (reference callbacks.py:43-57
        #: applies set_lr to the live optimizer).
        self.requested_lr: Optional[float] = None

    def poll(self) -> Optional[str]:
        """Returns "stop" if a stop command arrived, else None."""
        import zmq

        if self.socket.poll(self.timeout, zmq.POLLIN):
            msg = json.loads(self.socket.recv_string())
            command = msg.get("command")
            if command == "stop":
                return "stop"
            if command == "set_lr":
                logger.info("Remote set_lr: %s", msg.get("lr"))
                try:
                    self.requested_lr = float(msg.get("lr"))
                except (TypeError, ValueError):
                    logger.warning("Ignoring malformed set_lr: %r", msg.get("lr"))
        return None

    def take_requested_lr(self) -> Optional[float]:
        lr, self.requested_lr = self.requested_lr, None
        return lr
