"""Serving daemon tests: HTTP protocol over MicroBatcher (CPU, localhost)."""

import json
import threading
import urllib.request

import jax
import numpy as np
import optax
import pytest


@pytest.fixture(scope="module")
def daemon(tmp_path_factory):
    import jax.numpy as jnp

    from samplenet_tpu import serve
    from samplenet_tpu.models import SampleNet
    from samplenet_tpu.train import checkpoints

    tdir = tmp_path_factory.mktemp("serve")
    net = SampleNet(num_out_points=8, bottleneck_size=32, group_size=4)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, training=False)
    ckpt = f"{tdir}/ckpt"
    checkpoints.save(ckpt, {"params": jax.device_get(v["params"]),
                            "batch_stats": jax.device_get(v["batch_stats"])})
    server, batcher = serve.main(
        ["--ckpt", ckpt, "--num-points", "64", "--num-out-points", "8",
         "--bottleneck-size", "32", "--group-size", "4", "--max-batch", "4",
         "--port", "0"],  # port 0: OS-assigned, no collisions
        serve_forever=False)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server.server_address[1], (net, v)
    server.shutdown()
    batcher.close()


def test_healthz(daemon):
    port, _ = daemon
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
        meta = json.loads(r.read())
    assert meta["num_points"] == 64 and meta["num_out_points"] == 8


def test_sample_roundtrip(daemon):
    import jax.numpy as jnp

    port, (net, v) = daemon
    rng = np.random.RandomState(1)
    clouds = rng.randn(3, 64, 3).astype("<f4")
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/sample", data=clouds.tobytes(),
        method="POST")
    with urllib.request.urlopen(req) as r:
        out = np.frombuffer(r.read(), np.float32).reshape(3, 8, 3)
    _, exp = net.apply(v, jnp.asarray(clouds), training=False)
    np.testing.assert_allclose(out, np.asarray(exp), atol=1e-5)


def test_artifact_export_and_serve(daemon, tmp_path):
    """--export-artifact writes a frozen artifact; --artifact serves from
    it with identical outputs and no checkpoint access."""
    import numpy as np

    from samplenet_tpu import serve

    port, (net, v) = daemon
    # reuse the daemon fixture's checkpoint via a fresh export
    import jax

    from samplenet_tpu.train import checkpoints

    ckpt = str(tmp_path / "ckpt")
    checkpoints.save(ckpt, {"params": jax.device_get(v["params"]),
                            "batch_stats": jax.device_get(v["batch_stats"])})
    art = str(tmp_path / "sampler.sntpu")
    out = serve.main([
        "--ckpt", ckpt, "--num-points", "64", "--num-out-points", "8",
        "--bottleneck-size", "32", "--group-size", "4", "--max-batch", "4",
        "--export-artifact", art], serve_forever=False)
    assert out == (None, None) and __import__("os").path.exists(art)

    server2, batcher2 = serve.main(
        ["--artifact", art, "--port", "0"], serve_forever=False)
    try:
        import threading
        import urllib.request

        t = threading.Thread(target=server2.serve_forever, daemon=True)
        t.start()
        rng = np.random.RandomState(7)
        clouds = rng.randn(2, 64, 3).astype("<f4")
        req = urllib.request.Request(
            f"http://127.0.0.1:{server2.server_address[1]}/sample",
            data=clouds.tobytes(), method="POST")
        with urllib.request.urlopen(req) as r:
            got = np.frombuffer(r.read(), np.float32).reshape(2, 8, 3)
        import jax.numpy as jnp
        _, exp = net.apply(v, jnp.asarray(clouds), training=False)
        np.testing.assert_allclose(got, np.asarray(exp), atol=1e-5)
    finally:
        server2.shutdown()
        batcher2.close()


def test_bad_body_rejected(daemon):
    port, _ = daemon
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/sample", data=b"123", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
