"""Wire serialization for distribution payloads (parity: the pickle+zlib framing in
srl/runner/distribution — memory compress, rl/memories/replay_buffer.py compress and
server stdin-pickled params, server_actor.py:96-114)."""

from __future__ import annotations

import pickle
import zlib
from typing import Any

_MAGIC_Z = b"Z1"
_MAGIC_P = b"P1"


def dumps(obj: Any, compress: bool = True, level: int = 1) -> bytes:
    raw = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    if compress:
        return _MAGIC_Z + zlib.compress(raw, level)
    return _MAGIC_P + raw


def loads(data: bytes) -> Any:
    tag, body = data[:2], data[2:]
    if tag == _MAGIC_Z:
        return pickle.loads(zlib.decompress(body))
    if tag == _MAGIC_P:
        return pickle.loads(body)
    # untagged legacy payload
    return pickle.loads(data)
