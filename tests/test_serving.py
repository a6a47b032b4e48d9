"""Serving-bundle tests: AOT export round-trips vs the live engines
(to float ULP — the AOT loader may retune FMA contraction for generic
host features), survives disk serialization, and validates its inputs."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dctseg.config import tiny_model_config
from dctseg.infer.engine import Predictor
from dctseg.infer.serving import MANIFEST_NAME, ServingBundle, export_bundle
from dctseg.models.clswiseformer import build_model


class _PassThrough:
    """Fake model: 'probs' = first 4 input channels (position-coded)."""

    def apply(self, params, x, train=False):
        return (x[..., :4] + params,)


@pytest.fixture(scope="module")
def tiny_predictor():
    cfg = tiny_model_config()
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 32, 32, 32, 4))
    params = model.init({"params": key, "dropout": key}, x, train=False)
    return Predictor(model, params), x


def test_single_bundle_roundtrip(tiny_predictor, tmp_path):
    pred, x = tiny_predictor
    out = str(tmp_path / "single")
    manifest = export_bundle(pred, out, strategy="single",
                             input_shape=x.shape[1:4])
    assert set(manifest["programs"]) == {"forward"}
    bundle = ServingBundle.load(out)
    np.testing.assert_allclose(np.asarray(bundle.predict(x)),
                               np.asarray(pred.seg_probs(x)),
                               rtol=1e-4, atol=1e-6)
    labels = np.asarray(bundle.labels(x))
    assert labels.dtype == np.uint8 and labels.shape == x.shape[:4]
    # manifest records the real output geometry
    with open(os.path.join(out, MANIFEST_NAME)) as f:
        m = json.load(f)
    assert tuple(m["output_shape"]) == tuple(
        np.asarray(pred.seg_probs(x)).shape)


def test_tta_bundle_matches_live_engine(tiny_predictor, tmp_path):
    pred, x = tiny_predictor
    out = str(tmp_path / "tta")
    manifest = export_bundle(pred, out, strategy="tta",
                             input_shape=x.shape[1:4])
    assert set(manifest["programs"]) == {"flips", "forward", "unflip_mean"}
    bundle = ServingBundle.load(out)
    np.testing.assert_allclose(np.asarray(bundle.predict(x)),
                               np.asarray(pred.tta_probs(x)),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("stitch_mode", ["reference", "aligned"])
def test_tiling_bundle_matches_live_engine(tmp_path, stitch_mode):
    pred = Predictor(_PassThrough(), jnp.asarray(0.0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 240, 240, 160, 4))
                    .astype(np.float32))
    out = str(tmp_path / f"tiling_{stitch_mode}")
    manifest = export_bundle(pred, out, stitch_mode=stitch_mode)
    assert set(manifest["programs"]) == {"crops", "forward", "stitch"}
    assert manifest["stitch_mode"] == stitch_mode
    bundle = ServingBundle.load(out)
    np.testing.assert_array_equal(
        np.asarray(bundle.predict(x)),
        np.asarray(pred.tiled_probs(x, stitch_mode)))


def test_paired_tiling_bundle_matches_live_engine(tmp_path):
    """batch_volumes=V exports the volume-major batched crop/stitch stages
    (engine.tiled_probs_batch): one B=8V forward per request — the
    measured paired-tiling throughput optimum carried into serving."""
    pred = Predictor(_PassThrough(), jnp.asarray(0.0))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 240, 240, 160, 4))
                    .astype(np.float32))
    out = str(tmp_path / "paired")
    manifest = export_bundle(pred, out, strategy="tiling", batch_volumes=2)
    assert manifest["batch_volumes"] == 2
    assert tuple(manifest["output_shape"]) == (2, 240, 240, 155, 4)
    bundle = ServingBundle.load(out)
    np.testing.assert_array_equal(np.asarray(bundle.predict(x)),
                                  np.asarray(pred.tiled_probs_batch(x)))
    # exactly-V volumes per request; a single volume is refused clearly
    with pytest.raises(ValueError, match="shape"):
        bundle.predict(x[:1])
    # flip-TTA strategies stay per-volume
    with pytest.raises(ValueError, match="batch_volumes"):
        export_bundle(pred, str(tmp_path / "x"), strategy="tiling_tta",
                      batch_volumes=2)


def test_tiling_tta_bundle_matches_live_engine(tmp_path):
    """tiling_tta bundles: 8 flip-folded crop programs share one forward +
    stitch; a static unflip-softmax-mean program finishes.  Must reproduce
    the live engine's flip TTA over full tilings (engine.tiled_tta_probs:
    rev on the 155-truncated volume, softmax mean in f32)."""
    pred = Predictor(_PassThrough(), jnp.asarray(0.0))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 240, 240, 160, 4))
                    .astype(np.float32))
    out = str(tmp_path / "tiling_tta")
    manifest = export_bundle(pred, out, strategy="tiling_tta")
    assert set(manifest["programs"]) == (
        {f"crops_flip{i}" for i in range(8)}
        | {"forward", "stitch", "unflip_mean"})
    assert manifest["stitch_mode"] == "reference"
    bundle = ServingBundle.load(out)
    np.testing.assert_allclose(np.asarray(bundle.predict(x)),
                               np.asarray(pred.tiled_tta_probs(x)),
                               rtol=1e-6, atol=1e-7)


def test_bundle_rejects_wrong_shape_and_format(tiny_predictor, tmp_path):
    pred, x = tiny_predictor
    out = str(tmp_path / "single")
    export_bundle(pred, out, strategy="single", input_shape=x.shape[1:4])
    bundle = ServingBundle.load(out)
    with pytest.raises(ValueError, match="shape"):
        bundle.predict(jnp.zeros((1, 8, 8, 8, 4)))
    # future-format bundles are refused, not misread
    mpath = os.path.join(out, MANIFEST_NAME)
    with open(mpath) as f:
        m = json.load(f)
    m["format"] = 999
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="format"):
        ServingBundle.load(out)


def test_export_validates_strategy_and_shape(tiny_predictor, tmp_path):
    pred, _ = tiny_predictor
    with pytest.raises(ValueError, match="strategy"):
        export_bundle(pred, str(tmp_path / "x"), strategy="ensemble")
    with pytest.raises(ValueError, match="input_shape"):
        export_bundle(pred, str(tmp_path / "x"), strategy="tta")
    with pytest.raises(ValueError, match="geometry"):
        export_bundle(pred, str(tmp_path / "x"), strategy="tiling",
                      input_shape=(128, 128, 128))


def test_f16_wire_bundle_matches_live_engine(tiny_predictor, tmp_path):
    """float16 wire format: the bundle accepts (and casts callers' arrays
    to) f16, halving the host->device bytes per request; the model casts
    to its compute dtype at the first op (clswiseformer.py:168), so the
    only delta vs the f32 bundle is the input quantization — the same
    approximation class as DataConfig.transfer_dtype='bfloat16'."""
    pred, x = tiny_predictor
    out = str(tmp_path / "f16")
    manifest = export_bundle(pred, out, strategy="single",
                             input_shape=x.shape[1:4],
                             input_dtype=jnp.float16)
    assert manifest["input_dtype"] == "float16"
    bundle = ServingBundle.load(out)
    # an f32 caller array is accepted (cast host-side before transfer)
    got = np.asarray(bundle.predict(x))
    want = np.asarray(pred.seg_probs(jnp.asarray(x, jnp.float16)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    # and the quantization delta vs the f32 path stays input-noise sized
    ref = np.asarray(pred.seg_probs(x))
    assert np.max(np.abs(got - ref)) < 5e-3


def test_cross_platform_export_lowers_for_tpu(tiny_predictor, tmp_path):
    """A CPU build host can emit a TPU-servable artifact (multi-platform
    lowering); the CPU leg of the same bundle stays bit-identical."""
    pred, x = tiny_predictor
    out = str(tmp_path / "portable")
    manifest = export_bundle(pred, out, strategy="single",
                             input_shape=x.shape[1:4],
                             platforms=("cpu", "tpu"))
    assert set(manifest["platforms"]) == {"cpu", "tpu"}
    bundle = ServingBundle.load(out)
    np.testing.assert_allclose(np.asarray(bundle.predict(x)),
                               np.asarray(pred.seg_probs(x)),
                               rtol=1e-4, atol=1e-6)


# -- HTTP serving host (dctseg/infer/server.py) ----------------------------


def _http(url, body=None):
    import urllib.request
    req = urllib.request.Request(url, data=body, method="POST" if body
                                 else "GET")
    with urllib.request.urlopen(req) as r:
        return r.status, dict(r.headers), r.read()


def _http_err(url, body=None):
    import urllib.error
    import urllib.request
    req = urllib.request.Request(url, data=body, method="POST" if body
                                 else "GET")
    try:
        with urllib.request.urlopen(req):
            raise AssertionError("expected an HTTP error")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _npy_bytes(arr):
    import io
    buf = io.BytesIO()
    np.save(buf, np.asarray(arr))
    return buf.getvalue()


@pytest.fixture(scope="module")
def served(tiny_predictor, tmp_path_factory):
    import threading
    from dctseg.infer.server import BundleServer
    pred, x = tiny_predictor
    out = str(tmp_path_factory.mktemp("srv") / "bundle")
    export_bundle(pred, out, strategy="single", input_shape=x.shape[1:4])
    bundle = ServingBundle.load(out)
    server = BundleServer(bundle, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.port}", bundle, np.asarray(x)
    server.shutdown()


def test_server_health_and_manifest(served):
    base, bundle, _ = served
    status, _, body = _http(base + "/healthz")
    health = json.loads(body)
    assert status == 200 and health["status"] == "ok"
    assert health["strategy"] == "single"
    status, _, body = _http(base + "/v1/manifest")
    assert status == 200 and json.loads(body) == bundle.manifest


def test_server_predict_labels_and_probs(served):
    import io
    base, bundle, x = served
    status, headers, body = _http(base + "/v1/predict", _npy_bytes(x))
    assert status == 200
    assert headers["Content-Type"] == "application/x-npy"
    assert "X-Latency-Ms" in headers
    labels = np.load(io.BytesIO(body))
    np.testing.assert_array_equal(labels, np.asarray(bundle.labels(x)))
    assert labels.dtype == np.uint8
    # probs output, and a 4-D body (no leading batch dim) is accepted
    status, _, body = _http(base + "/v1/predict?output=probs",
                            _npy_bytes(x[0]))
    probs = np.load(io.BytesIO(body))
    np.testing.assert_array_equal(probs, np.asarray(bundle.predict(x)))


def test_server_preprocess_applies_pipeline_zscore(served):
    import io
    from dctseg.data.brats import zscore_nonzero
    base, bundle, x = served
    rng = np.random.default_rng(7)
    raw = (rng.uniform(50, 500, size=x.shape).astype(np.float32)
           * (rng.uniform(size=x.shape) > 0.3))  # zeros stay background
    status, _, body = _http(base + "/v1/predict?output=probs&preprocess=1",
                            _npy_bytes(raw))
    assert status == 200
    normed = np.stack([zscore_nonzero(raw[0, ..., c])
                       for c in range(raw.shape[-1])], axis=-1)[None]
    np.testing.assert_array_equal(np.load(io.BytesIO(body)),
                                  np.asarray(bundle.predict(normed)))


def test_server_rejects_bad_requests(served):
    base, _, x = served
    code, err = _http_err(base + "/v1/predict",
                          _npy_bytes(np.zeros((1, 8, 8, 8, 4), np.float32)))
    assert code == 400 and "shape" in err["error"]
    code, err = _http_err(base + "/v1/predict", b"not an npy payload")
    assert code == 400 and "npy" in err["error"]
    code, err = _http_err(base + "/v1/predict?output=midi", _npy_bytes(x))
    assert code == 400 and "output" in err["error"]
    code, _ = _http_err(base + "/nope")
    assert code == 404
    code, _ = _http_err(base + "/v1/other", _npy_bytes(x))
    assert code == 404


def test_serve_cli_parse_and_helper(tiny_predictor, tmp_path):
    """Driver wiring: scripts/serve.py flags + the load-from-dir helper."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "serve_cli",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "serve.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    a = cli.parse_args(["--bundle", "b", "--port", "0", "--no-warmup"])
    assert a.bundle == "b" and a.port == 0 and a.no_warmup

    pred, x = tiny_predictor
    out = str(tmp_path / "bundle")
    export_bundle(pred, out, strategy="single", input_shape=x.shape[1:4])
    from dctseg.infer.server import serve_bundle
    server = serve_bundle(out, port=0, warmup=False)
    try:
        assert server.port > 0
        assert server.bundle.strategy == "single"
    finally:
        server.shutdown()


def test_export_serving_cli(tmp_path):
    """Driver wiring: random-params smoke export of a tiny single bundle."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "export_serving_cli",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "export_serving.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    out = str(tmp_path / "cli_bundle")
    rc = cli.main(["--out", out, "--strategy", "single", "--random-params",
                   "--img-dim", "32", "--base-channels", "4", "--fp32",
                   "--input-shape", "32", "32", "32"])
    assert rc == 0
    bundle = ServingBundle.load(out)
    y = bundle.predict(jnp.zeros((1, 32, 32, 32, 4)))
    assert y.shape[:4] == (1, 32, 32, 32)


def test_export_serving_cli_int8_paired_composition(tmp_path):
    """The throughput levers compose through the driver: --quantize int8
    (PTQ execution strategy) x --batch-volumes 2 (paired requests) x
    --input-dtype float16 (wire format) export one bundle that loads and
    predicts with jax only."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "export_serving_cli2",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "export_serving.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    out = str(tmp_path / "cli_int8_paired")
    rc = cli.main(["--out", out, "--strategy", "single", "--random-params",
                   "--img-dim", "32", "--base-channels", "4",
                   "--quantize", "int8", "--batch-volumes", "2",
                   "--input-dtype", "float16",
                   "--input-shape", "32", "32", "32"])
    assert rc == 0
    bundle = ServingBundle.load(out)
    m = bundle.manifest
    assert m["batch_volumes"] == 2 and m["input_dtype"] == "float16"
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 32, 32, 32, 4)).astype(np.float32)
    y = np.asarray(bundle.predict(jnp.asarray(x)))
    assert y.shape[:4] == (2, 32, 32, 32)
    assert np.isfinite(y).all()


class _FakePairedBundle:
    """Stands in for a paired ServingBundle (batch_volumes=V): records the
    batch shape of every device call and returns a per-volume fingerprint
    so the test can check each client got its own volume's answer."""

    strategy = "tiling"

    def __init__(self, v=3, shape=(4, 4, 4), ch=2):
        self.manifest = {"batch_volumes": v, "input_shape": list(shape),
                         "in_channels": ch, "input_dtype": "float32",
                         "strategy": "tiling"}
        self.calls = []

    def labels(self, x):
        import time as _t
        x = np.asarray(x)
        self.calls.append(x.shape)
        _t.sleep(0.05)  # device time: lets concurrent clients pile up
        return np.round(x.mean(axis=(1, 2, 3, 4))[:, None, None, None]
                        * 100).astype(np.int32) * np.ones((1, 2, 2, 2),
                                                          np.int32)

    predict = labels


def test_server_coalesces_concurrent_single_volume_requests():
    """Concurrent single-volume clients on a paired bundle must be
    coalesced into ONE padded B=8V program (docs/PERF.md 'Paired tiling':
    the measured-optimal batch) instead of V serialized calls — and each
    client must get its own volume's answer back."""
    import threading
    import urllib.request
    from dctseg.infer.server import BundleServer
    fake = _FakePairedBundle(v=3)
    server = BundleServer(fake, port=0, warmup=False, coalesce_wait_s=0.5)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        rng = np.random.default_rng(0)
        vols = [rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32)
                for _ in range(3)]
        results = [None] * 3

        def post(i):
            req = urllib.request.Request(base + "/v1/predict",
                                         data=_npy_bytes(vols[i]),
                                         method="POST")
            with urllib.request.urlopen(req) as r:
                import io
                results[i] = np.load(io.BytesIO(r.read()))

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i in range(3):
            want = round(float(vols[i].mean()) * 100)
            assert results[i] is not None
            np.testing.assert_array_equal(
                results[i], np.full((1, 2, 2, 2), want, np.int32))
        # the three requests ran as ONE B=3 call, not three padded calls
        assert fake.calls == [(3, 4, 4, 4, 2)], fake.calls

        # a lone request still completes (padded partial group)...
        fake.calls.clear()
        post(0)
        assert fake.calls == [(3, 4, 4, 4, 2)]
        # ...and a whole-group request takes the direct path
        grp = np.concatenate(vols, axis=0)
        req = urllib.request.Request(base + "/v1/predict",
                                     data=_npy_bytes(grp), method="POST")
        with urllib.request.urlopen(req) as r:
            import io
            out = np.load(io.BytesIO(r.read()))
        assert out.shape == (3, 2, 2, 2)
        # healthz reports the coalescer state
        status, _, body = _http(base + "/healthz")
        health = json.loads(body)
        assert status == 200 and health["coalesce_volumes"] == 3
        assert health["last_group_size"] >= 1
    finally:
        server.shutdown()


class _LazyOut:
    """Mimics jax's async dispatch: the bundle call returns immediately
    and ``np.asarray`` (the fetch) blocks for ``delay`` — so tests can
    observe whether the coalescer overlaps dispatch with fetch."""

    def __init__(self, arr, delay, on_fetch):
        self._arr, self._delay, self._on_fetch = arr, delay, on_fetch

    def __array__(self, dtype=None, copy=None):
        import time as _t
        _t.sleep(self._delay)
        self._on_fetch(_t.monotonic())
        a = np.asarray(self._arr)
        return a.astype(dtype) if dtype is not None else a


class _AsyncFakeBundle(_FakePairedBundle):
    """Paired bundle whose device calls are async (dispatch returns a
    lazy handle; the fetch costs ``fetch_delay``), recording dispatch and
    fetch-completion timestamps."""

    def __init__(self, v=2, fetch_delay=0.3):
        super().__init__(v=v)
        self.fetch_delay = fetch_delay
        self.dispatch_times = []
        self.fetch_done_times = []

    def labels(self, x):
        import time as _t
        x = np.asarray(x)
        self.calls.append(x.shape)
        self.dispatch_times.append(_t.monotonic())
        out = np.round(x.mean(axis=(1, 2, 3, 4))[:, None, None, None]
                       * 100).astype(np.int32) * np.ones((1, 2, 2, 2),
                                                         np.int32)
        return _LazyOut(out, self.fetch_delay,
                        self.fetch_done_times.append)

    predict = labels


def _serve_coalescing(fake, wait_s):
    import threading
    from dctseg.infer.server import BundleServer
    server = BundleServer(fake, port=0, warmup=False,
                          coalesce_wait_s=wait_s)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, f"http://127.0.0.1:{server.port}"


def _post_predict(base, vol, output="labels"):
    import io
    import urllib.request
    req = urllib.request.Request(
        base + f"/v1/predict?output={output}",
        data=_npy_bytes(vol), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return np.load(io.BytesIO(r.read()))


def test_coalescer_mixed_output_group_dispatches_both_before_fetch():
    """A mixed labels/probs group must enqueue BOTH device programs
    back-to-back (async dispatch) instead of serializing two
    dispatch+fetch round trips (VERDICT r4 item 5): the second dispatch
    happens BEFORE the first fetch completes."""
    import threading
    fake = _AsyncFakeBundle(v=2, fetch_delay=0.4)
    server, base = _serve_coalescing(fake, wait_s=0.5)
    try:
        vol = np.random.default_rng(0).normal(
            size=(1, 4, 4, 4, 2)).astype(np.float32)
        results = {}

        def post(output):
            results[output] = _post_predict(base, vol, output)

        threads = [threading.Thread(target=post, args=(o,))
                   for o in ("labels", "probs")]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert set(results) == {"labels", "probs"}
        for out in results.values():
            assert out.shape == (1, 2, 2, 2)
        assert len(fake.dispatch_times) == 2
        assert len(fake.fetch_done_times) == 2
        # both programs were in flight together: dispatch #2 preceded the
        # completion of fetch #1
        assert fake.dispatch_times[1] < min(fake.fetch_done_times), (
            fake.dispatch_times, fake.fetch_done_times)
    finally:
        server.shutdown()


def test_coalescer_pipelines_across_groups():
    """Group i+1's device program must be dispatched while group i's
    fetch is still pending (depth-2 pipeline — the eval loop's measured
    dispatch pattern, docs/PERF.md)."""
    import threading
    fake = _AsyncFakeBundle(v=2, fetch_delay=0.5)
    server, base = _serve_coalescing(fake, wait_s=0.15)
    try:
        rng = np.random.default_rng(1)
        vols = [rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32)
                for _ in range(4)]
        results = [None] * 4

        def post(i):
            results[i] = _post_predict(base, vols[i])

        # 4 concurrent single-volume clients on a V=2 bundle -> 2 groups
        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i in range(4):
            want = round(float(vols[i].mean()) * 100)
            np.testing.assert_array_equal(
                results[i], np.full((1, 2, 2, 2), want, np.int32))
        assert len(fake.dispatch_times) == 2, fake.calls
        # group 2 dispatched before group 1's fetch completed
        assert fake.dispatch_times[1] < min(fake.fetch_done_times), (
            fake.dispatch_times, fake.fetch_done_times)
    finally:
        server.shutdown()


def test_coalescer_stop_fails_stranded_submitters_fast():
    """A submit racing stop() must get a prompt error, not sit out the
    5 s liveness poll (ADVICE r4): the submit lock orders every enqueue
    before the shutdown sentinel, and the dispatcher's drain fails what
    it finds behind it."""
    import threading
    import time as _t
    from dctseg.infer.server import BundleServer
    fake = _FakePairedBundle(v=2)
    server = BundleServer(fake, port=0, warmup=False, coalesce_wait_s=5.0)
    co = server._coalescer
    vol = np.zeros((1, 4, 4, 4, 2), np.float32)
    outcome = {}

    def submitter():
        t0 = _t.monotonic()
        try:
            co.submit(vol, "labels")
            outcome["ok"] = True
        except RuntimeError as e:
            outcome["err"] = str(e)
        outcome["dt"] = _t.monotonic() - t0

    # the submitter blocks inside the 5 s coalesce window (group of 1 on
    # a V=2 bundle) when stop() lands
    th = threading.Thread(target=submitter)
    th.start()
    _t.sleep(0.2)
    t_stop = _t.monotonic()
    server.shutdown()
    th.join(timeout=10)
    assert not th.is_alive()
    # the in-window group either completes (dispatcher finishes the open
    # group on shutdown) or errors — but promptly, not after the 5 s
    # window + liveness poll
    assert _t.monotonic() - t_stop < 3.0
    assert outcome.get("ok") or "stopped" in outcome.get("err", "")
    # and a submit AFTER stop raises immediately
    t0 = _t.monotonic()
    try:
        co.submit(vol, "labels")
        raise AssertionError("expected RuntimeError after stop()")
    except RuntimeError:
        pass
    assert _t.monotonic() - t0 < 1.0


def test_coalescer_device_failure_fans_out_and_server_survives():
    """A failure while assembling or running a coalesced group (e.g.
    MemoryError concatenating V volumes on a low-memory host) must fan
    out to the waiting clients as HTTP 500 — not kill the dispatcher
    thread and strand every later request in an unbounded wait."""
    import threading
    import urllib.error
    import urllib.request
    from dctseg.infer.server import BundleServer

    class _ExplodingBundle(_FakePairedBundle):
        def __init__(self):
            super().__init__(v=2)
            self.fail_next = True

        def labels(self, x):
            if self.fail_next:
                self.fail_next = False
                raise MemoryError("forced group failure (test)")
            return super().labels(x)

        predict = labels

    fake = _ExplodingBundle()
    server = BundleServer(fake, port=0, warmup=False, coalesce_wait_s=0.1)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        vol = np.zeros((1, 4, 4, 4, 2), np.float32)
        req = urllib.request.Request(base + "/v1/predict",
                                     data=_npy_bytes(vol), method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected HTTP 500 from the failed group")
        except urllib.error.HTTPError as e:
            assert e.code == 500
        # the dispatcher survived: the next request succeeds normally
        req = urllib.request.Request(base + "/v1/predict",
                                     data=_npy_bytes(vol), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            import io
            out = np.load(io.BytesIO(r.read()))
        assert out.shape == (1, 2, 2, 2)
    finally:
        server.shutdown()
