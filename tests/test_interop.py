"""Torch-checkpoint interop: reference-keyed state_dicts round-trip into
our flax trees with matching forward numerics.

The torch modules here carry the EXACT attribute names of the reference
(registration/src/samplenet.py:40-62, registration/models/pcrnet.py:17-60)
so their state_dict keys are byte-identical to what a real reference
`model_best.pth` contains (registration/main.py:196-218).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from samplenet_tpu.interop import (  # noqa: E402
    infer_samplenet_config,
    load_torch_checkpoint,
    pcrnet_from_torch,
    pcrnet_to_torch,
    samplenet_from_torch,
    samplenet_to_torch,
    sp_pcrnet_from_torch,
)
from samplenet_tpu.models.pcrnet import PCRNet  # noqa: E402
from samplenet_tpu.models.samplenet import SampleNet  # noqa: E402


def make_ref_samplenet(num_out=8, bottleneck=128):
    """Torch module with the reference's attribute names
    (registration/src/samplenet.py:40-62)."""
    import torch.nn as nn

    class Project(nn.Module):
        def __init__(self):
            super().__init__()
            self._temperature = nn.Parameter(torch.tensor(0.73))

    class RefSampleNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv1d(3, 64, 1)
            self.conv2 = nn.Conv1d(64, 64, 1)
            self.conv3 = nn.Conv1d(64, 64, 1)
            self.conv4 = nn.Conv1d(64, 128, 1)
            self.conv5 = nn.Conv1d(128, bottleneck, 1)
            self.bn1 = nn.BatchNorm1d(64)
            self.bn2 = nn.BatchNorm1d(64)
            self.bn3 = nn.BatchNorm1d(64)
            self.bn4 = nn.BatchNorm1d(128)
            self.bn5 = nn.BatchNorm1d(bottleneck)
            self.fc1 = nn.Linear(bottleneck, 256)
            self.fc2 = nn.Linear(256, 256)
            self.fc3 = nn.Linear(256, 256)
            self.fc4 = nn.Linear(256, 3 * num_out)
            self.bn_fc1 = nn.BatchNorm1d(256)
            self.bn_fc2 = nn.BatchNorm1d(256)
            self.bn_fc3 = nn.BatchNorm1d(256)
            self.project = Project()

        def forward(self, x):  # [B, 3, N] -> simplified [B, m, 3]
            y = torch.relu(self.bn1(self.conv1(x)))
            y = torch.relu(self.bn2(self.conv2(y)))
            y = torch.relu(self.bn3(self.conv3(y)))
            y = torch.relu(self.bn4(self.conv4(y)))
            y = torch.relu(self.bn5(self.conv5(y)))
            y = torch.max(y, 2)[0]
            y = torch.relu(self.bn_fc1(self.fc1(y)))
            y = torch.relu(self.bn_fc2(self.fc2(y)))
            y = torch.relu(self.bn_fc3(self.fc3(y)))
            return self.fc4(y).view(-1, num_out, 3)

    m = RefSampleNet()
    # non-trivial running stats so eval-mode BN is actually exercised
    g = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.copy_(
                    torch.randn(mod.num_features, generator=g) * 0.2)
                mod.running_var.copy_(
                    torch.rand(mod.num_features, generator=g) + 0.5)
    return m


def make_ref_pcrnet(bottleneck=1024):
    """Torch module with the reference's attribute names
    (registration/models/pcrnet.py:17-60)."""
    import torch.nn as nn
    import torch.nn.functional as F

    class Feat(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv1d(3, 64, 1)
            self.conv2 = nn.Conv1d(64, 64, 1)
            self.conv3 = nn.Conv1d(64, 64, 1)
            self.conv4 = nn.Conv1d(64, 128, 1)
            self.conv5 = nn.Conv1d(128, bottleneck, 1)

        def forward(self, x):
            for c in (self.conv1, self.conv2, self.conv3, self.conv4,
                      self.conv5):
                x = torch.relu(c(x))
            return torch.max(x, 2)[0]

    class RefPCRNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.feat = Feat()
            self.fc1 = nn.Linear(bottleneck * 2, 1024)
            self.fc2 = nn.Linear(1024, 1024)
            self.fc3 = nn.Linear(1024, 512)
            self.fc4 = nn.Linear(512, 512)
            self.fc5 = nn.Linear(512, 256)
            self.fc6 = nn.Linear(256, 7)

        def forward(self, x0, x1):
            y = torch.cat([self.feat(x0), self.feat(x1)], dim=1)
            for fc in (self.fc1, self.fc2, self.fc3, self.fc4, self.fc5):
                y = torch.relu(fc(y))
            y = self.fc6(y)
            quat = F.normalize(y[:, 0:4], dim=1)
            return torch.cat([quat, y[:, 4:]], dim=1)

    return RefPCRNet()


def sd_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


class TestSampleNetImport:
    def test_forward_parity(self):
        tm = make_ref_samplenet().eval()
        sd = {f"sampler.{k}": v for k, v in sd_numpy(tm).items()}
        variables = samplenet_from_torch(sd)

        x = np.random.RandomState(0).randn(4, 3, 32).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.tensor(x)).numpy()

        model = SampleNet(num_out_points=8, **{
            k: v for k, v in infer_samplenet_config(sd).items()
            if k != "num_out_points"})
        got = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 1))),
                          training=False, method=SampleNet.simplify)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
        assert float(variables["params"]["project"]["temperature"]) == \
            pytest.approx(0.73)

    def test_infer_config(self):
        sd = {f"sampler.{k}": v for k, v in
              sd_numpy(make_ref_samplenet(num_out=13, bottleneck=96)).items()}
        cfg = infer_samplenet_config(sd)
        assert cfg == {
            "num_out_points": 13, "bottleneck_size": 96,
            "conv_widths": (64, 64, 64, 128), "fc_widths": (256, 256, 256),
            "fc_bn": True,
        }

    def test_export_roundtrip_identity(self):
        model = SampleNet(num_out_points=8)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 3)),
                               training=True)
        sd = samplenet_to_torch(variables)
        back = samplenet_from_torch(sd)
        flat_a = jax.tree_util.tree_leaves_with_path(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]})
        flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
        for path, leaf in flat_a:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_b[path]), atol=0,
                err_msg=str(path))

    def test_unexpected_key_raises(self):
        sd = {f"sampler.{k}": v for k, v in
              sd_numpy(make_ref_samplenet()).items()}
        sd["sampler.mystery.weight"] = np.zeros(3, np.float32)
        with pytest.raises(ValueError, match="mystery"):
            samplenet_from_torch(sd)

    def test_missing_key_raises(self):
        sd = {f"sampler.{k}": v for k, v in
              sd_numpy(make_ref_samplenet()).items()}
        del sd["sampler.bn3.running_mean"]
        with pytest.raises(KeyError, match="bn3.running_mean"):
            samplenet_from_torch(sd)


class TestPCRNetImport:
    def test_forward_parity(self):
        tm = make_ref_pcrnet().eval()
        variables = pcrnet_from_torch(sd_numpy(tm))

        rs = np.random.RandomState(1)
        x0 = rs.randn(3, 3, 24).astype(np.float32)
        x1 = rs.randn(3, 3, 24).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.tensor(x0), torch.tensor(x1)).numpy()

        twist, _ = PCRNet().apply(
            variables, jnp.asarray(np.transpose(x0, (0, 2, 1))),
            jnp.asarray(np.transpose(x1, (0, 2, 1))))
        np.testing.assert_allclose(np.asarray(twist), want, atol=2e-5)

    def test_export_roundtrip_identity(self):
        variables = PCRNet().init(jax.random.PRNGKey(2), jnp.zeros((2, 16, 3)),
                                  jnp.zeros((2, 16, 3)))
        back = pcrnet_from_torch(pcrnet_to_torch(variables))
        flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
        for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_b[path]), atol=0,
                err_msg=str(path))


class TestJointCheckpoint:
    def test_load_and_split_model_best(self, tmp_path):
        """End-to-end: a reference-style model_best.pth (joint SP-PCRNet
        state_dict, registration/main.py:209) through the CLI surface."""
        pcr = make_ref_pcrnet()
        sn = make_ref_samplenet()
        joint = dict(sd_numpy(pcr))
        joint.update({f"sampler.{k}": v for k, v in sd_numpy(sn).items()})
        path = tmp_path / "model_best.pth"
        torch.save({k: torch.tensor(v) for k, v in joint.items()}, path)

        sd = load_torch_checkpoint(str(path))
        pcr_vars, sn_vars = sp_pcrnet_from_torch(sd)
        assert sn_vars is not None
        assert "feat" in pcr_vars["params"]
        assert float(sn_vars["params"]["project"]["temperature"]) == \
            pytest.approx(0.73)

    def test_snapshot_wrapper_and_ddp_prefix(self, tmp_path):
        """Snapshot dicts ({"model": ..., "optimizer": ...},
        registration/main.py:196-207) and DDP "module." prefixes unwrap."""
        pcr = make_ref_pcrnet()
        wrapped = {
            "epoch": 7,
            "model": {f"module.{k}": torch.tensor(v)
                      for k, v in sd_numpy(pcr).items()},
            "optimizer": {"state": {}, "param_groups": []},
        }
        path = tmp_path / "snap.pth"
        torch.save(wrapped, path)
        sd = load_torch_checkpoint(str(path))
        assert "feat.conv1.weight" in sd
        pcr_vars, sn_vars = sp_pcrnet_from_torch(sd)
        assert sn_vars is None
