"""ZMQ paired messaging with handshake.

Rebuild of ``/root/reference/sleap/message.py:21`` (``PairedSender`` /
``PairedReceiver``): a PAIR-socket channel with a setup handshake, used for
inter-process control (GUI <-> training subprocess).
"""

from __future__ import annotations

import json
import time
from typing import Any, Dict, List, Optional

HANDSHAKE_MESSAGE = "hello"
HANDSHAKE_RESPONSE = "hello back"


class BaseMessageParticipant:
    def __init__(self, address: str = "tcp://127.0.0.1:9001"):
        self.address = address
        self.context = None
        self.socket = None

    def setup(self) -> None:
        raise NotImplementedError

    def close(self) -> None:
        if self.socket is not None:
            self.socket.close()
        if self.context is not None:
            self.context.term()


class PairedSender(BaseMessageParticipant):
    """Sends messages; handshake confirms a receiver is listening."""

    def setup(self) -> None:
        import zmq

        self.context = zmq.Context()
        self.socket = self.context.socket(zmq.PAIR)
        self.socket.bind(self.address)

    def send_dict(self, data: Dict[str, Any]) -> None:
        self.socket.send_string(json.dumps(data))

    def send_array(self, header: Dict[str, Any], array) -> None:
        import numpy as np

        header = dict(header)
        header["dtype"] = str(array.dtype)
        header["shape"] = list(array.shape)
        self.socket.send_string(json.dumps(header), flags=2)  # SNDMORE
        self.socket.send(np.ascontiguousarray(array).tobytes())

    def send_handshake(self, timeout: float = 2.0) -> bool:
        import zmq

        self.send_dict({"message": HANDSHAKE_MESSAGE})
        t0 = time.time()
        while time.time() - t0 < timeout:
            if self.socket.poll(100, zmq.POLLIN):
                reply = json.loads(self.socket.recv_string())
                if reply.get("message") == HANDSHAKE_RESPONSE:
                    return True
        return False


class PairedReceiver(BaseMessageParticipant):
    """Receives messages; responds to sender handshakes."""

    def setup(self) -> None:
        import zmq

        self.context = zmq.Context()
        self.socket = self.context.socket(zmq.PAIR)
        self.socket.connect(self.address)

    def check_messages(self, timeout: float = 0.01) -> List[Dict[str, Any]]:
        import zmq
        import numpy as np

        messages = []
        while self.socket.poll(int(timeout * 1000), zmq.POLLIN):
            msg = json.loads(self.socket.recv_string())
            if msg.get("message") == HANDSHAKE_MESSAGE:
                self.socket.send_string(json.dumps({"message": HANDSHAKE_RESPONSE}))
                continue
            if "dtype" in msg and "shape" in msg:
                buf = self.socket.recv()
                msg["array"] = np.frombuffer(buf, dtype=msg["dtype"]).reshape(
                    msg["shape"]
                )
            messages.append(msg)
        return messages
