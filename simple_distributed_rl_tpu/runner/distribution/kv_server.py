"""Self-contained coordination server (stands in for the reference's Redis,
srl/runner/distribution/connectors/redis_.py, with the same verb set the framework
uses: GET/SET/DEL/KEYS + RPUSH/LPOP/LLEN + SETNX/INCR for atomic task claims).

Pure stdlib: a ThreadingTCPServer speaking length-prefixed pickle frames. Run
standalone with::

    python -m simple_distributed_rl_tpu.runner.distribution.kv_server --port 25530

or embed in-process with ``KVServer(port=0).start()`` (port 0 picks a free port).
"""

from __future__ import annotations

import argparse
import pickle
import socket
import socketserver
import struct
import threading
from collections import deque
from typing import Any, Dict, Optional, Tuple

_HDR = struct.Struct(">I")


def send_frame(sock: socket.socket, obj: Any) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(_HDR.pack(len(data)) + data)


def recv_frame(sock: socket.socket) -> Any:
    hdr = _recv_exact(sock, _HDR.size)
    if hdr is None:
        raise ConnectionError("peer closed")
    (n,) = _HDR.unpack(hdr)
    body = _recv_exact(sock, n)
    if body is None:
        raise ConnectionError("peer closed mid-frame")
    return pickle.loads(body)


def _recv_exact(sock: socket.socket, n: int) -> Optional[bytes]:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


class _Store:
    """The in-memory data model: a string->bytes map plus string->deque queues."""

    def __init__(self):
        self.lock = threading.Lock()
        self.kv: Dict[str, Any] = {}
        self.lists: Dict[str, deque] = {}

    def execute(self, cmd: str, args: Tuple) -> Any:
        with self.lock:
            if cmd == "ping":
                return "pong"
            if cmd == "get":
                return self.kv.get(args[0])
            if cmd == "set":
                self.kv[args[0]] = args[1]
                return True
            if cmd == "setnx":  # atomic claim
                if args[0] in self.kv:
                    return False
                self.kv[args[0]] = args[1]
                return True
            if cmd == "delete":
                self.kv.pop(args[0], None)
                self.lists.pop(args[0], None)
                return True
            if cmd == "exists":
                return args[0] in self.kv or args[0] in self.lists
            if cmd == "keys":
                prefix = args[0] if args else ""
                return [k for k in list(self.kv) + list(self.lists) if k.startswith(prefix)]
            if cmd == "incr":
                v = int(self.kv.get(args[0], 0)) + int(args[1] if len(args) > 1 else 1)
                self.kv[args[0]] = v
                return v
            if cmd == "rpush":
                self.lists.setdefault(args[0], deque()).append(args[1])
                return len(self.lists[args[0]])
            if cmd == "lpop":
                q = self.lists.get(args[0])
                return q.popleft() if q else None
            if cmd == "llen":
                q = self.lists.get(args[0])
                return len(q) if q else 0
            if cmd == "flushall":
                self.kv.clear()
                self.lists.clear()
                return True
            raise ValueError(f"unknown command: {cmd}")


class KVServer:
    """Threaded TCP coordination server. ``port=0`` binds a free port (see ``.port``)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 25530):
        store = self._store = _Store()

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                while True:
                    try:
                        cmd, *args = recv_frame(self.request)
                    except (ConnectionError, EOFError, OSError):
                        return
                    try:
                        out = (True, store.execute(cmd, tuple(args)))
                    except Exception as e:  # report, keep serving
                        out = (False, repr(e))
                    try:
                        send_frame(self.request, out)
                    except OSError:
                        return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "KVServer":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def serve_forever(self) -> None:
        self._server.serve_forever()


def main(argv=None):
    p = argparse.ArgumentParser(description="simple_distributed_rl_tpu coordination server")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=25530)
    args = p.parse_args(argv)
    server = KVServer(args.host, args.port)
    print(f"kv_server listening on {server.host}:{server.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
