"""HTTP serving front (facialmmt_tpu/serve_http.py): request decode, routing
through the AsyncBatchServer packer, health/stats, and error surfaces."""

import base64
import dataclasses
import json
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from facialmmt_tpu.config import FacialMMTConfig

CFG = FacialMMTConfig.tiny()


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.fixture(scope="module")
def http_front(rng):
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline
    from facialmmt_tpu.serve_http import serve
    from facialmmt_tpu.serving import AsyncBatchServer, EmotionServer
    from tests.test_models import make_multimodal_batch

    cfg = CFG.replace(runtime=dataclasses.replace(
        CFG.runtime, deterministic_gumbel=True))
    batch = make_multimodal_batch(rng, cfg, b=2)
    model = FacialMMTPipeline(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)
    small = EmotionServer(cfg, variables, max_batch=1, face_capacity=4)
    big = EmotionServer(cfg, variables, max_batch=4, face_capacity=16)
    front = AsyncBatchServer([small, big], batch_deadline_ms=50.0)
    httpd, app = serve(front, port=0, block=False)
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield url, front, small
    httpd.shutdown()
    front.close()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_healthz_lists_buckets(http_front):
    url, _, _ = http_front
    status, body = _get(url + "/healthz")
    assert status == 200
    assert body["ok"] is True
    assert body["buckets"] == [[1, 4], [4, 16]]


def test_predict_matches_direct_path(http_front, rng):
    url, _, small = http_front
    d = CFG.data
    audio = rng.normal(size=(5, d.audio_feat_dim))
    faces = rng.integers(0, 255, (2, 160, 160, 3), dtype=np.uint8)
    payload = {
        "audio": audio.tolist(),
        "faces": base64.b64encode(faces.tobytes()).decode(),
        "faces_shape": list(faces.shape),
        "input_ids": rng.integers(2, CFG.text.vocab_size, size=(12,)).tolist(),
    }
    status, body = _post(url + "/predict", payload)
    assert status == 200
    probs = np.asarray(body["probs"])
    assert probs.shape == (7,)
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-4)
    assert body["label"] == int(np.argmax(probs))

    # the HTTP path must equal the library path for the same request
    direct = small.predict([{  # deterministic gumbel -> comparable
        "audio": audio.astype(np.float32),
        "faces": faces,
        "input_ids": np.asarray(payload["input_ids"], np.int32),
        "utt_in_dia_idx": 0,
    }])[0]
    np.testing.assert_allclose(probs, direct, rtol=1e-4, atol=1e-5)

    # nested-list faces are accepted too
    status2, body2 = _post(url + "/predict", {
        "audio": audio.tolist(), "faces": faces.tolist(),
        "input_ids": payload["input_ids"]})
    assert status2 == 200
    np.testing.assert_allclose(body2["probs"], probs, rtol=1e-4, atol=1e-5)


def test_stats_reports_packs_and_buckets(http_front):
    url, front, _ = http_front
    status, body = _get(url + "/stats")
    assert status == 200
    assert body["n_packs"] == len(front.pack_sizes) >= 1
    assert sum(body["bucket_counts"].values()) == body["n_packs"]


def test_load_serving_variables_grafts_batch_stats(tmp_path):
    """--checkpoint must load MULTIMODAL-trainer bests, which store
    {params, batch_stats} (Swin head BatchNorm statistics live in
    batch_stats — serving random-init stats would corrupt every
    probability), as well as {params}-only text/dialogue bests
    (review r4: the old {params} template crashed on the former)."""
    from facialmmt_tpu.checkpoint.orbax_io import CheckpointManager
    from facialmmt_tpu.serve_http import load_serving_variables

    init_vars = {"params": {"w": np.zeros(3, np.float32)},
                 "batch_stats": {"bn": {"mean": np.zeros(2, np.float32)}}}

    mm_dir = str(tmp_path / "mm")
    CheckpointManager(mm_dir).save_best(
        {"params": {"w": np.ones(3, np.float32)},
         "batch_stats": {"bn": {"mean": np.full(2, 5.0, np.float32)}}}, 3)
    out = load_serving_variables(init_vars, mm_dir)
    np.testing.assert_array_equal(out["params"]["w"], np.ones(3))
    np.testing.assert_array_equal(out["batch_stats"]["bn"]["mean"],
                                  np.full(2, 5.0))

    txt_dir = str(tmp_path / "txt")
    CheckpointManager(txt_dir).save_best(
        {"params": {"w": np.full(3, 2.0, np.float32)}}, 1)
    out2 = load_serving_variables(init_vars, txt_dir)
    np.testing.assert_array_equal(out2["params"]["w"], np.full(3, 2.0))
    np.testing.assert_array_equal(out2["batch_stats"]["bn"]["mean"],
                                  np.zeros(2))  # init stats kept


def test_error_surfaces(http_front):
    url, _, _ = http_front
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(url + "/nope")
    assert e.value.code == 404
    # malformed faces payload -> 400 with the exception surfaced, not a hang
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/predict", {"faces": "!!notbase64!!",
                                 "faces_shape": [1, 160, 160, 3]})
    assert e.value.code == 400
    body = json.loads(e.value.read())
    assert "error" in body
