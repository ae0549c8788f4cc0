"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from samplenet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    shard_batch,
    shard_params,
)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


class TestMesh:
    def test_default_all_data(self):
        mesh = make_mesh()
        assert dict(mesh.shape) == {"data": 8, "model": 1}

    def test_data_model_split(self):
        mesh = make_mesh(model=2)
        assert dict(mesh.shape) == {"data": 4, "model": 2}

    def test_invalid_split_raises(self):
        with pytest.raises(ValueError):
            make_mesh(data=3, model=2)


class TestSharding:
    def test_batch_sharded_over_data(self):
        mesh = make_mesh(model=2)
        x = jnp.zeros((8, 16, 3))
        xs = shard_batch(mesh, x)
        assert xs.sharding.spec == P("data")

    def test_param_rules_tp_wide_kernels(self):
        mesh = make_mesh(model=2)
        rule = param_sharding_rules(mesh)
        wide = jax.ShapeDtypeStruct((128, 1024), jnp.float32)
        narrow = jax.ShapeDtypeStruct((64, 64), jnp.float32)
        assert rule((), wide).spec == P(None, "model")
        assert rule((), narrow).spec == P()

    def test_sharded_equals_replicated_compute(self):
        """Data-parallel forward must match single-device numerics."""
        from samplenet_tpu.models import SampleNet

        net = SampleNet(num_out_points=8, bottleneck_size=32, group_size=4)
        x = jnp.asarray(np.random.RandomState(0).randn(8, 64, 3), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x[:2], training=False)

        ref_simp, ref_match = jax.jit(
            lambda v, x: net.apply(v, x, training=False))(v, x)

        mesh = make_mesh()
        with mesh:
            vs = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, NamedSharding(mesh, P())), v)
            xs = shard_batch(mesh, x)
            simp, match = jax.jit(
                lambda v, x: net.apply(v, x, training=False))(vs, xs)
        np.testing.assert_allclose(np.asarray(simp), np.asarray(ref_simp),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(match), np.asarray(ref_match),
                                   atol=1e-5)

    def test_tensor_parallel_classifier_matches(self):
        """TP-sharded wide kernels produce the same logits."""
        from samplenet_tpu.models.pointnet_cls import PointNetClassifier

        model = PointNetClassifier(num_classes=10)
        x = jnp.asarray(np.random.RandomState(1).randn(8, 64, 3), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x[:2], training=False)
        ref, _ = jax.jit(lambda v, x: model.apply(v, x, training=False))(v, x)

        mesh = make_mesh(model=2)
        with mesh:
            params = shard_params(mesh, v["params"])
            bs = shard_params(mesh, v["batch_stats"])
            xs = shard_batch(mesh, x)
            out, _ = jax.jit(lambda p, b, x: model.apply(
                {"params": p, "batch_stats": b}, x, training=False))(
                    params, bs, xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


class TestPallasUnderMesh:
    """The partitioned Pallas kernels (ops/pallas/partitioning.py) under a
    batch-sharded mesh: numerics identical to single-device, outputs stay
    batch-sharded, and the compiled program contains NO all-gather — the
    kernel is not silently replicated (the failure mode of an unwrapped
    pallas_call under GSPMD)."""

    def _mesh(self):
        return make_mesh()

    def test_nn_direction_sharded(self):
        from samplenet_tpu.ops.pallas import nn_direction

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(16, 64, 3), jnp.float32)
        y = jnp.asarray(rng.randn(16, 96, 3), jnp.float32)
        ref_d, ref_i = nn_direction(x, y, interpret=True)
        mesh = self._mesh()
        with mesh:
            xs, ys = shard_batch(mesh, (x, y))
            f = jax.jit(lambda a, b: nn_direction(a, b, interpret=True))
            d, i = f(xs, ys)
            hlo = f.lower(xs, ys).compile().as_text()
        assert d.sharding.spec == P("data")
        assert "all-gather" not in hlo
        np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))

    def test_nn_snap_sharded(self):
        from samplenet_tpu.ops.pallas import nn_snap

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(16, 64, 3), jnp.float32)
        y = jnp.asarray(rng.randn(16, 96, 3), jnp.float32)
        ref_d, ref_i, ref_p = nn_snap(x, y, interpret=True)
        mesh = self._mesh()
        with mesh:
            xs, ys = shard_batch(mesh, (x, y))
            f = jax.jit(lambda a, b: nn_snap(a, b, interpret=True))
            d, i, p = f(xs, ys)
            hlo = f.lower(xs, ys).compile().as_text()
        assert p.sharding.spec[0] == "data"
        assert "all-gather" not in hlo
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
        np.testing.assert_array_equal(np.asarray(p), np.asarray(ref_p))

    def test_emd_cost_kernel_sharded(self):
        """The fused approx-EMD kernel (r5) under a data mesh: batch-sharded
        callers must run it collective-free with sharded outputs, like
        every other partitioned kernel."""
        from samplenet_tpu.ops.pallas.emd_kernel import emd_cost_pallas

        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(16, 128, 3), jnp.float32)
        y = jnp.asarray(rng.randn(16, 96, 3), jnp.float32)
        ref_c, ref_g1, ref_g2 = emd_cost_pallas(x, y, interpret=True)
        mesh = self._mesh()
        with mesh:
            xs, ys = shard_batch(mesh, (x, y))
            f = jax.jit(lambda a, b: emd_cost_pallas(a, b, interpret=True))
            c, g1, g2 = f(xs, ys)
            hlo = f.lower(xs, ys).compile().as_text()
        assert c.sharding.spec == P("data")
        assert g1.sharding.spec[0] == "data"
        assert "all-gather" not in hlo
        np.testing.assert_allclose(np.asarray(c), np.asarray(ref_c),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(ref_g1),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(ref_g2),
                                   atol=1e-6)

    def test_fps_seeded_sharded(self):
        from samplenet_tpu.ops.pallas import fps_from_given_pallas

        rng = np.random.RandomState(1)
        pts = jnp.asarray(rng.randn(16, 64, 3), jnp.float32)
        given = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (16, 1))
        cnt = jnp.asarray(rng.randint(1, 5, 16), jnp.int32)
        ref = fps_from_given_pallas(8, pts, given, cnt, interpret=True)
        mesh = self._mesh()
        with mesh:
            ps, gs, cs = shard_batch(mesh, (pts, given, cnt))
            f = jax.jit(lambda p, g, c: fps_from_given_pallas(
                8, p, g, c, interpret=True))
            idx = f(ps, gs, cs)
            hlo = f.lower(ps, gs, cs).compile().as_text()
        assert idx.sharding.spec == P("data")
        assert "all-gather" not in hlo
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))

    def test_fps_with_points_sharded(self):
        from samplenet_tpu.ops.pallas.fps_kernel import (
            fps_from_given_pallas_with_points,
        )

        rng = np.random.RandomState(2)
        pts = jnp.asarray(rng.randn(16, 64, 3), jnp.float32)
        given = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (16, 1))
        cnt = jnp.asarray(rng.randint(1, 5, 16), jnp.int32)
        ref_i, ref_x = fps_from_given_pallas_with_points(
            8, pts, given, cnt, interpret=True)
        mesh = self._mesh()
        with mesh:
            ps, gs, cs = shard_batch(mesh, (pts, given, cnt))
            f = jax.jit(lambda p, g, c: fps_from_given_pallas_with_points(
                8, p, g, c, interpret=True))
            idx, xyz = f(ps, gs, cs)
            hlo = f.lower(ps, gs, cs).compile().as_text()
        assert idx.sharding.spec == P("data")
        assert xyz.sharding.spec == P("data")
        assert "all-gather" not in hlo
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
        np.testing.assert_array_equal(np.asarray(xyz), np.asarray(ref_x))

    def test_soft_project_grad_sharded(self):
        """The differentiable fused soft projection: forward kernel
        partitioned, custom-VJP backward auto-partitioned; gradients for
        clouds AND sigma match single-device."""
        from samplenet_tpu.ops.pallas import soft_project

        rng = np.random.RandomState(2)
        p = jnp.asarray(rng.randn(16, 64, 3), jnp.float32)
        q = jnp.asarray(rng.randn(16, 8, 3), jnp.float32)
        sig = jnp.float32(0.3)

        def loss(p, q, s):
            return jnp.sum(soft_project(p, q, s, 4, 128, True) ** 2)

        gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        ref = gfn(p, q, sig)
        mesh = self._mesh()
        with mesh:
            ps, qs = shard_batch(mesh, (p, q))
            out = gfn(ps, qs, sig)
        for o, r in zip(out, ref):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=1e-5)

    def test_eval_matching_sort_paths_on_mesh(self):
        """nn_match_from_clouds at m > 128 under the mesh: sort-based unique
        + sort-based compaction + seeded FPS, parity with single-device."""
        from samplenet_tpu.ops.matching import nn_match_from_clouds

        rng = np.random.RandomState(3)
        full = jnp.asarray(rng.randn(8, 256, 3), jnp.float32)
        simp = jnp.asarray(rng.randn(8, 144, 3), jnp.float32)
        ref, ref_idx = jax.jit(
            lambda f, s: nn_match_from_clouds(f, s, 144))(full, simp)
        mesh = self._mesh()
        with mesh:
            fs, ss = shard_batch(mesh, (full, simp))
            out, idx = jax.jit(
                lambda f, s: nn_match_from_clouds(f, s, 144))(fs, ss)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_ghost_bn_train_kernel_sharded(self):
        """Fused ghost-BN TRAIN kernel under the mesh: ghost blocks never
        cross shard boundaries (block dim P is the partitioned dim), so
        forward, exact-global EMA stats, AND gradients are bit-compatible
        with single-device; no all-gather in the compiled program."""
        from samplenet_tpu.ops.pallas.point_mlp_train_kernel import (
            point_mlp_train_max,
        )

        rng = np.random.RandomState(7)
        feats = (8, 16)
        x = jnp.asarray(rng.randn(16, 128, 3), jnp.float32)
        ws = []
        cin = 3
        for f in feats:
            ws.append(jnp.asarray(rng.randn(cin, f) * 0.2, jnp.float32))
            cin = f
        bs = tuple(jnp.zeros((f,), jnp.float32) for f in feats)
        gm = tuple(jnp.ones((f,), jnp.float32) for f in feats)
        bt = tuple(jnp.zeros((f,), jnp.float32) for f in feats)

        # block_b=2 -> P=8 blocks, 1 per device on the 8-way 'data' axis
        def fwd(x, ws, gm, bt):
            pooled, means, vars_ = point_mlp_train_max(
                x, tuple(ws), bs, gm, bt, block_b=2, interpret=True)
            return pooled, means, vars_

        def loss(x, ws, gm, bt):
            pooled, _, _ = fwd(x, ws, gm, bt)
            return jnp.sum(pooled ** 2)

        ref_out = jax.jit(fwd)(x, tuple(ws), gm, bt)
        ref_grads = jax.jit(jax.grad(loss, argnums=(0, 1)))(
            x, tuple(ws), gm, bt)
        mesh = self._mesh()
        with mesh:
            xs = shard_batch(mesh, x)
            f = jax.jit(fwd)
            out = f(xs, tuple(ws), gm, bt)
            hlo = f.lower(xs, tuple(ws), gm, bt).compile().as_text()
            grads = jax.jit(jax.grad(loss, argnums=(0, 1)))(
                xs, tuple(ws), gm, bt)
        assert out[0].sharding.spec == P("data")
        assert "all-gather" not in hlo
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5),
            out, ref_out)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5),
            grads, ref_grads)


class TestDryrun:
    def test_graft_entry_dryrun(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestDataParallelLoop:
    def test_samplenet_train_loop_on_mesh(self):
        """One epoch of the real training loop on the 8-device mesh."""
        import jax.numpy as jnp
        from samplenet_tpu.models.pointnet_cls import PointNetClassifier
        from samplenet_tpu.train.classification import (
            SampleNetConfig,
            create_samplenet_state,
            train_samplenet_loop,
        )
        from samplenet_tpu.utils.logging import Logger

        scfg = SampleNetConfig(num_out_points=8, bottleneck_size=32,
                               group_size=4, batch_size=8)
        sampler, state = create_samplenet_state(scfg, 64, jax.random.PRNGKey(0))
        classifier = PointNetClassifier(num_classes=4)
        c_vars = classifier.init(jax.random.PRNGKey(1),
                                 jnp.zeros((2, 8, 3)), training=False)
        rng = np.random.RandomState(0)
        data = rng.randn(16, 64, 3).astype(np.float32)
        labels = rng.randint(0, 4, 16).astype(np.int32)
        mesh = make_mesh()
        with mesh:
            state = train_samplenet_loop(
                sampler, state, scfg, classifier, c_vars,
                (data, labels), (data, labels),
                epochs=1, logger=Logger(None), rng=jax.random.PRNGKey(2),
                mesh=mesh)
        assert int(state.step) == 2  # 16 clouds / batch 8


class TestInputPipeline:
    def test_global_batches_sharded(self):
        from samplenet_tpu.parallel.input_pipeline import global_batches
        from jax.sharding import PartitionSpec as P
        mesh = make_mesh()
        data = np.random.RandomState(0).randn(32, 16, 3).astype(np.float32)
        labels = np.arange(32, dtype=np.int32)
        batches = list(global_batches(mesh, data, labels, 16, shuffle=False))
        assert len(batches) == 2
        bx, by = batches[0]
        assert bx.shape == (16, 16, 3)
        assert bx.sharding.spec == P("data")
        np.testing.assert_array_equal(np.asarray(by), labels[:16])


class TestNonfiniteGuard:
    def test_skips_nan_updates(self):
        import optax
        from samplenet_tpu.train.state import TrainState, with_nonfinite_guard
        import jax.numpy as jnp
        tx = with_nonfinite_guard(optax.sgd(0.1))
        state = TrainState.create(params={"w": jnp.ones(3)}, batch_stats={},
                                  tx=tx)
        good = {"w": jnp.ones(3)}
        bad = {"w": jnp.asarray([jnp.nan, 1.0, 1.0])}
        s1 = state.apply_gradients(bad)
        np.testing.assert_allclose(np.asarray(s1.params["w"]),
                                   np.ones(3))  # update skipped
        s2 = s1.apply_gradients(good)
        np.testing.assert_allclose(np.asarray(s2.params["w"]),
                                   0.9 * np.ones(3))

    def test_ae_train_step_survives_nan_batch(self):
        """The guard is default-on in every trainer: one poisoned batch
        (observed with approx-EMD under heavy corruption) must not NaN the
        params — training continues on the next batch."""
        import jax.numpy as jnp
        from samplenet_tpu.train.reconstruction import (
            AEConfig, create_ae_state, make_ae_train_step)

        cfg = AEConfig(num_points=32, n_sample_points=32, bottleneck_size=8,
                       batch_size=4)
        model, state = create_ae_state(cfg, jax.random.PRNGKey(0))
        step = make_ae_train_step(model, cfg)
        x = jnp.asarray(np.random.RandomState(0).randn(4, 32, 3), np.float32)
        bad = x.at[0, 0, 0].set(jnp.nan)
        state, loss = step(state, bad)
        assert not bool(jnp.isfinite(loss))
        assert all(bool(jnp.all(jnp.isfinite(p)))
                   for p in jax.tree.leaves(state.params))
        state, loss = step(state, x)
        assert bool(jnp.isfinite(loss))


class TestMultiProcess:
    @staticmethod
    def _spawn(nproc, ndev_per_proc, extra_args):
        import os
        import socket
        import subprocess
        import sys

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        coord = f"127.0.0.1:{port}"
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={ndev_per_proc}")
        worker = os.path.join(os.path.dirname(__file__),
                              "multihost_worker.py")
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), str(nproc), coord,
                 *extra_args],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True)
            for i in range(nproc)
        ]
        outs = []
        for p in procs:
            # generous: 4 fresh jax processes compile serially when the host
            # is already loaded (measured 8 min under a full suite run)
            out, _ = p.communicate(timeout=1800)
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {i} failed:\n{out}"
            assert "WORKER_OK" in out, f"worker {i} output:\n{out}"
        return outs

    def test_four_process_train_and_cross_mesh_restore(self, tmp_path):
        """VERDICT r2 item 8: 4 processes x 2 devices running REAL sampler
        train steps (host_shard remainder exercised), a SHARDED orbax save
        from all processes, then restore in THIS single process on a
        different mesh shape (4x2 data/model) and one further train step."""
        import jax.numpy as jnp

        ckpt = str(tmp_path / "sharded_ckpt")
        outs = self._spawn(4, 2, ["train", ckpt])
        # all processes observed identical global losses
        loss_lines = [
            [l for l in o.splitlines() if l.startswith("loss ")]
            for o in outs
        ]
        assert loss_lines[0] == loss_lines[1] == loss_lines[2] == loss_lines[3]
        assert len(loss_lines[0]) == 2
        saved_pnorm = float(
            [l for l in outs[0].splitlines()
             if l.startswith("pnorm ")][0].split()[1])

        # cross-PROCESS-COUNT restore (VERDICT r4 item 7): the checkpoint
        # written by 4 processes x 2 devices is restored by 2 processes x 4
        # devices — each restoring process reads shards written by others
        r_outs = self._spawn(2, 4, ["restore", ckpt])
        for o in r_outs:
            assert "step 2" in o, o
            got = float([l for l in o.splitlines()
                         if l.startswith("pnorm ")][0].split()[1])
            assert abs(got - saved_pnorm) < 1e-4 * max(1.0, saved_pnorm), (
                got, saved_pnorm)

        # restore on a different mesh shape in this (1-process) runtime
        from samplenet_tpu.models.pointnet_cls import PointNetClassifier
        from samplenet_tpu.train import checkpoints
        from samplenet_tpu.train.classification import (
            SampleNetConfig,
            create_samplenet_state,
            make_samplenet_train_step,
        )

        mesh = make_mesh(model=2)  # 4x2 vs the workers' 8x1 over 4 procs
        batch, num_points = 16, 64
        scfg = SampleNetConfig(num_out_points=8, bottleneck_size=32,
                               group_size=4, batch_size=batch)
        sampler, state = create_samplenet_state(
            scfg, num_points, jax.random.PRNGKey(0))
        with mesh:
            rep = NamedSharding(mesh, P())
            put = lambda t: jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep) if hasattr(x, "shape")
                else x, t)
            target = {"params": put(state.params),
                      "batch_stats": put(state.batch_stats),
                      "step": jax.device_put(state.step, rep)}
            tree = checkpoints.restore_sharded(ckpt, target)
            assert int(tree["step"]) == 2
            state = state.replace(params=tree["params"],
                                  batch_stats=tree["batch_stats"],
                                  opt_state=put(state.opt_state),
                                  step=tree["step"])
            classifier = PointNetClassifier(num_classes=4)
            c_vars = put(classifier.init(
                jax.random.PRNGKey(1), jnp.zeros((2, 8, 3)), training=False))
            step_fn = make_samplenet_train_step(
                sampler, classifier, c_vars, scfg, augment_data=False)
            rng = np.random.RandomState(1)
            bx = shard_batch(mesh, jnp.asarray(
                rng.randn(batch, num_points, 3), jnp.float32))
            by = shard_batch(mesh, jnp.asarray(
                (np.arange(batch) % 4).astype(np.int32)))
            state, metrics = step_fn(state, bx, by, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 3

    def test_uneven_host_data_counts(self):
        """Hosts that loaded their own files hold DIFFERENT local lengths
        (8, 9, 10, 11 rows at local_batch=2); global_batches(
        process_local=True) must sync the per-epoch batch count to the
        min across hosts — without the sync the shorter hosts stop first
        and every other host's make_array_from_process_local_data hangs
        (VERDICT r4 item 7)."""
        outs = self._spawn(4, 2, ["uneven"])
        for o in outs:
            sums = [l for l in o.splitlines() if l.startswith("batch")]
            assert len(sums) == 2, o  # min(2, 2, 3, 3) despite longer hosts
        assert all(
            [l for l in o.splitlines() if l.startswith("batch")]
            == [l for l in outs[0].splitlines() if l.startswith("batch")]
            for o in outs)

    def test_multiprocess_input_pipeline(self):
        """TRUE multi-process distributed run (2 processes x 2 CPU devices,
        joined via jax.distributed like a multi-host pod over DCN) — covers
        jax.make_array_from_process_local_data assembly in
        parallel/input_pipeline.py, unreachable from a single process."""
        import os
        import socket
        import subprocess
        import sys

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        coord = f"127.0.0.1:{port}"
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        worker = os.path.join(os.path.dirname(__file__),
                              "multihost_worker.py")
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), "2", coord],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True)
            for i in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {i} failed:\n{out}"
            assert "WORKER_OK" in out, f"worker {i} output:\n{out}"
        # both processes must observe identical global reductions
        sums0 = [l for l in outs[0].splitlines() if l.startswith("batch")]
        sums1 = [l for l in outs[1].splitlines() if l.startswith("batch")]
        assert sums0 == sums1 and len(sums0) == 2, (sums0, sums1)
