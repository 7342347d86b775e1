"""REST encoder stage: request shaping, response decode, actor-pool use.

Contracts mirrored from texoo-encoder-api (RESTAdapter.java:5-14,
AbstractRESTAdapter.java:16-120); network replaced by a fake transport."""

import json

import numpy as np
import pyarrow as pa
import pytest

from texoo_ray.stages.rest_encoder import HttpRestAdapter, RestEncoderStage


def fake_transport_factory(dim=4, log=None):
    """Deterministic fake endpoint: vec[i] = (len(text), i, ...)"""

    def transport(url, payload, headers, connect_timeout, read_timeout):
        if log is not None:
            log.append((url, headers["Content-Type"]))
        req = json.loads(payload.decode("utf-8"))
        out = [[float(len(t))] * dim for t in req["texts"]]
        return json.dumps({"result": out}).encode("utf-8")

    return transport


class TestAdapter:
    def test_encode_batch_and_single(self):
        log = []
        a = HttpRestAdapter(
            "http://enc.local/v1", 4, transport=fake_transport_factory(4, log)
        )
        m = a.encode_batch(["ab", "abcd"])
        assert m.shape == (2, 4) and m[0, 0] == 2.0 and m[1, 0] == 4.0
        v = a.encode("xyz")
        assert v.shape == (4,) and v[0] == 3.0
        assert log[0] == ("http://enc.local/v1", "application/json")

    def test_nested_encoding(self):
        a = HttpRestAdapter("http://enc.local", 4, transport=fake_transport_factory(4))
        rows = a.encode_nested([["a", "bb"], ["ccc"]])
        assert len(rows) == 2 and rows[0].shape == (2, 4) and rows[1].shape == (1, 4)

    def test_shape_mismatch_raises(self):
        def bad(url, payload, headers, ct, rt):
            return json.dumps({"result": [[1.0, 2.0]]}).encode()

        a = HttpRestAdapter("http://enc.local", 4, transport=bad)
        with pytest.raises(ValueError, match="expected"):
            a.encode_batch(["x"])

    def test_empty_batch(self):
        a = HttpRestAdapter("http://enc.local", 4, transport=fake_transport_factory())
        assert a.encode_batch([]).shape == (0, 4)


def _adapter_factory():
    return HttpRestAdapter("http://enc.local", 4, transport=fake_transport_factory(4))


class TestStage:
    def test_stage_attaches_embeddings(self):
        """Stage contract (adapter built once in __init__, one request per
        sub-batch, list<float32> output) — called directly; the actor-pool
        plumbing is identical to every other stage class in stages/."""
        stage = RestEncoderStage(adapter_factory=_adapter_factory, sub_batch=2)
        out = stage(
            pa.table(
                {"doc_id": pa.array([1, 2, 3], pa.int64()), "text": ["a", "bb", None]}
            )
        )
        emb = np.asarray(out["embedding"].combine_chunks().flatten()).reshape(3, 4)
        assert emb[0, 0] == 1.0 and emb[1, 0] == 2.0 and emb[2, 0] == 0.0  # None -> ""
