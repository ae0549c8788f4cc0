"""Cross-framework parity: our flax SampleNet vs a torch replica of the
reference architecture (registration/src/samplenet.py) carrying THE SAME
weights. Validates the simplification network numerics, the soft projection,
and the end-to-end matched output across frameworks — the numerical-oracle
strategy recommended in SURVEY.md §4 (torch CPU forward as reference).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from samplenet_tpu.models import SampleNet, SoftProjection  # noqa: E402


def build_torch_simplifier(bottleneck: int, num_out: int):
    import torch.nn as nn

    class Simplify(nn.Module):
        def __init__(self):
            super().__init__()
            widths = [3, 64, 64, 64, 128, bottleneck]
            self.convs = nn.ModuleList(
                [nn.Conv1d(a, b, 1) for a, b in zip(widths[:-1], widths[1:])])
            self.cbns = nn.ModuleList([nn.BatchNorm1d(w) for w in widths[1:]])
            self.fcs = nn.ModuleList(
                [nn.Linear(bottleneck, 256), nn.Linear(256, 256),
                 nn.Linear(256, 256)])
            self.fbns = nn.ModuleList([nn.BatchNorm1d(256) for _ in range(3)])
            self.out = nn.Linear(256, 3 * num_out)

        def forward(self, x):  # [B, 3, N]
            for conv, bn in zip(self.convs, self.cbns):
                x = torch.relu(bn(conv(x)))
            x = torch.max(x, 2)[0]
            for fc, bn in zip(self.fcs, self.fbns):
                x = torch.relu(bn(fc(x)))
            return self.out(x).view(-1, num_out, 3)

    return Simplify()


def copy_flax_to_torch(params, batch_stats, tmodel):
    """Load the flax simplifier weights into the torch replica."""
    convs = params["simplifier"]["convs"]
    convs_bs = batch_stats["simplifier"]["convs"]
    with torch.no_grad():
        for i, (conv, bn) in enumerate(zip(tmodel.convs, tmodel.cbns)):
            w = np.asarray(convs[f"dense_{i}"]["kernel"])  # [in, out]
            b = np.asarray(convs[f"dense_{i}"]["bias"])
            conv.weight.copy_(torch.tensor(w.T[..., None]))  # [out, in, 1]
            conv.bias.copy_(torch.tensor(b))
            bn.weight.copy_(torch.tensor(np.asarray(convs[f"bn_{i}"]["scale"])))
            bn.bias.copy_(torch.tensor(np.asarray(convs[f"bn_{i}"]["bias"])))
            bn.running_mean.copy_(
                torch.tensor(np.asarray(convs_bs[f"bn_{i}"]["mean"])))
            bn.running_var.copy_(
                torch.tensor(np.asarray(convs_bs[f"bn_{i}"]["var"])))
        fcs = params["simplifier"]["fcs"]
        fcs_bs = batch_stats["simplifier"]["fcs"]
        for i, (fc, bn) in enumerate(zip(tmodel.fcs, tmodel.fbns)):
            fc.weight.copy_(torch.tensor(
                np.asarray(fcs[f"dense_{i}"]["kernel"]).T))
            fc.bias.copy_(torch.tensor(np.asarray(fcs[f"dense_{i}"]["bias"])))
            bn.weight.copy_(torch.tensor(np.asarray(fcs[f"bn_{i}"]["scale"])))
            bn.bias.copy_(torch.tensor(np.asarray(fcs[f"bn_{i}"]["bias"])))
            bn.running_mean.copy_(
                torch.tensor(np.asarray(fcs_bs[f"bn_{i}"]["mean"])))
            bn.running_var.copy_(
                torch.tensor(np.asarray(fcs_bs[f"bn_{i}"]["var"])))
        out = params["simplifier"]["out"]
        tmodel.out.weight.copy_(torch.tensor(np.asarray(out["kernel"]).T))
        tmodel.out.bias.copy_(torch.tensor(np.asarray(out["bias"])))


@pytest.fixture(scope="module")
def nets():
    net = SampleNet(num_out_points=16, bottleneck_size=64, group_size=4)
    x = np.random.RandomState(0).randn(4, 256, 3).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), training=False)
    # randomize running stats so BN eval actually transforms
    bs = jax.tree_util.tree_map(
        lambda a: a + 0.1 * np.random.RandomState(1).randn(*a.shape)
        .astype(np.float32) if a.ndim else a, variables["batch_stats"])
    bs = jax.tree_util.tree_map(lambda a: jnp.abs(a) + 0.5, bs)
    variables = {"params": variables["params"], "batch_stats": bs}
    tmodel = build_torch_simplifier(64, 16).eval()
    copy_flax_to_torch(variables["params"], variables["batch_stats"], tmodel)
    return net, variables, tmodel, x


class TestTorchParity:
    def test_simplifier_forward_matches(self, nets):
        net, variables, tmodel, x = nets
        ours = np.asarray(net.apply(variables, jnp.asarray(x), training=False,
                                    method=SampleNet.simplify))
        with torch.no_grad():
            theirs = tmodel(torch.tensor(x).permute(0, 2, 1)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)

    def test_soft_projection_matches_torch_formula(self, nets):
        """Independent torch computation of softmax(-d^2/sigma^2) mixing."""
        net, variables, tmodel, x = nets
        simp = np.asarray(net.apply(variables, jnp.asarray(x), training=False,
                                    method=SampleNet.simplify))
        proj = SoftProjection(group_size=4, initial_temperature=0.7,
                              min_sigma=1e-2)
        pvars = proj.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(simp), method=SoftProjection.project)
        ours, _, _ = proj.apply(pvars, jnp.asarray(x), jnp.asarray(simp),
                                method=SoftProjection.project)
        # torch: full cdist -> topk -> softmax -> weighted sum
        with torch.no_grad():
            tx, ts = torch.tensor(x), torch.tensor(simp)
            d = torch.cdist(ts, tx) ** 2                       # [B, M, N]
            dist, idx = torch.topk(d, k=4, dim=-1, largest=False)
            sigma = max(0.7 ** 2, 1e-2)
            w = torch.softmax(-dist / sigma, dim=-1)
            grouped = torch.gather(
                tx[:, None].expand(-1, ts.shape[1], -1, -1), 2,
                idx[..., None].expand(-1, -1, -1, 3))
            theirs = (grouped * w[..., None]).sum(2).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs,
                                   rtol=1e-3, atol=1e-4)

    def test_matched_output_points_match(self, nets):
        """End-to-end eval: matched clouds equal a torch+numpy replica of
        the reference inference path (1-NN -> unique -> FPS completion)."""
        from tests.oracles import nn_matching_np

        net, variables, tmodel, x = nets
        _, ours = net.apply(variables, jnp.asarray(x), training=False)
        with torch.no_grad():
            simp = tmodel(torch.tensor(x).permute(0, 2, 1))
            d = torch.cdist(simp, torch.tensor(x))
            idx = d.argmin(-1).numpy()
        theirs = nn_matching_np(x, idx, 16)
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)
