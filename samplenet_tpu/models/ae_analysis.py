"""AE latent-space analysis ops.

Parity with the reconstruction track's analysis API
(reconstruction/src/{autoencoder,sampler_autoencoder}.py): latent transform/
interpolate/decode, EMD-based sample matching + sample interpolation
(sampler_autoencoder.py:88-131), critical-point indices (the max-pool
argmax contributors), and batched reconstructions-from-sampled. All pure
functions over (ae, ae_vars) so they compose with any checkpoint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from samplenet_tpu.models.autoencoder import PointNetAE, ae_per_cloud_chamfer
from samplenet_tpu.nn.layers import PointMLP  # noqa: F401  (doc reference)
from samplenet_tpu.ops.fps import gather_point
from samplenet_tpu.ops.matching import approx_match


def transform(ae: PointNetAE, ae_vars: dict, x: jax.Array) -> jax.Array:
    """Clouds -> latent codes [B, bottleneck]."""
    return ae.apply(ae_vars, x, training=False, method=PointNetAE.encode)


def decode(ae: PointNetAE, ae_vars: dict, z: jax.Array) -> jax.Array:
    """Latent codes -> reconstructions."""
    return ae.apply(ae_vars, z, method=PointNetAE.decode)


def interpolate(
    ae: PointNetAE, ae_vars: dict, x: jax.Array, y: jax.Array, steps: int
) -> jax.Array:
    """Decode a latent-space line between clouds x and y ([N,3] each):
    returns [steps+2, n_out, 3] (autoencoder.py interpolate)."""
    z = transform(ae, ae_vars, jnp.stack([x, y]))
    alphas = jnp.linspace(0.0, 1.0, steps + 2)[:, None]
    all_z = (1.0 - alphas) * z[0][None] + alphas * z[1][None]
    return decode(ae, ae_vars, all_z)


def match_samples(s1: jax.Array, s2: jax.Array) -> jax.Array:
    """Reorder s1's points to best-match s2 via approx-EMD argmax
    (sampler_autoencoder.match_samples): returns s1 permuted-ish [B, M, 3]."""
    match = approx_match(s2, s1)                   # [B, M2, M1]
    best = jnp.argmax(match, axis=2).astype(jnp.int32)  # for each s2 point
    return gather_point(s1, best)


def interpolate_samples(
    s1: jax.Array, s2: jax.Array, steps: int
) -> jax.Array:
    """Linear interpolation between matched sample sets ([M,3] each):
    s1 is EMD-matched to s2 first so points travel to their transport
    partners (sampler_autoencoder.py:118-131)."""
    s1m = match_samples(s1[None], s2[None])[0]
    alphas = jnp.linspace(0.0, 1.0, steps + 2)[:, None, None]
    return (1.0 - alphas) * s1m[None] + alphas * s2[None]


def critical_idx(ae: PointNetAE, ae_vars: dict, x: jax.Array) -> jax.Array:
    """Indices of the critical set: for every global-feature channel, the
    input point that attains the max (sampler_autoencoder.get_critical_idx).

    Returns [B, bottleneck] int32 indices into the N axis.
    """
    def encoder_feats(x):
        mlp = PointNetAE(
            num_output_points=ae.num_output_points,
            bottleneck_size=ae.bottleneck_size,
            encoder_widths=ae.encoder_widths,
            decoder_widths=ae.decoder_widths,
            use_bn=ae.use_bn,
        )
        # re-run just the per-point encoder via the module's method
        return mlp.apply(ae_vars, x, training=False,
                         method=lambda m, x, training: m.encoder_mlp(
                             x, training=training))

    feats = encoder_feats(x)             # [B, N, bottleneck]
    return jnp.argmax(feats, axis=1).astype(jnp.int32)


def reconstructions_from_sampled(
    ae: PointNetAE, ae_vars: dict, sampled: np.ndarray, batch_size: int = 50
) -> np.ndarray:
    """Batched AE forward over sampled clouds
    (sampler_autoencoder.get_reconstructions_from_sampled)."""
    fwd = jax.jit(lambda x: ae.apply(ae_vars, x, training=False))
    outs = []
    for s in range(0, len(sampled), batch_size):
        outs.append(np.asarray(fwd(jnp.asarray(sampled[s : s + batch_size]))))
    return np.concatenate(outs)


def nn_distances_per_cloud(
    ae: PointNetAE, ae_vars: dict, clouds: np.ndarray, samples: np.ndarray,
    batch_size: int = 100,
) -> np.ndarray:
    """Per-cloud chamfer between reconstructions-from-samples and originals
    (sampler_autoencoder.get_nn_distances)."""
    fwd = jax.jit(
        lambda s, x: ae_per_cloud_chamfer(
            ae.apply(ae_vars, s, training=False), x))
    outs = []
    for i in range(0, len(clouds), batch_size):
        outs.append(np.asarray(fwd(jnp.asarray(samples[i : i + batch_size]),
                                   jnp.asarray(clouds[i : i + batch_size]))))
    return np.concatenate(outs)
