"""Spatially-sharded forward (parallel/spatial.py): exact equivalence to the
dense model over a (data, space) mesh — explicit ppermute halos + psum
GroupNorm stats against UNetSuperRes.apply on the same params."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import ModelConfig
from mri_superresolution_tpu.models import (UNetSuperRes, build_model,
                                            init_params)
from mri_superresolution_tpu.parallel import (build_spatial_forward,
                                              make_spatial_mesh)


@pytest.fixture(scope="module")
def dense_and_params():
    model = UNetSuperRes(base_filters=16, dtype=jnp.float32)
    params = init_params(model, jax.random.key(0), (32, 32))
    return model, params


@pytest.fixture(scope="module")
def tpu_dense_and_params():
    model = build_model(ModelConfig(model_type="unet_tpu", base_filters=16),
                        dtype=jnp.float32)
    params = init_params(model, jax.random.key(1), (32, 32))
    return model, params


def _rand_batch(n, h, w, seed=0):
    return np.random.default_rng(seed).random((n, h, w, 1), np.float32)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8), (4, 2)])
@pytest.mark.parametrize("model_type", ["unet", "unet_tpu"])
def test_matches_dense_forward(dense_and_params, tpu_dense_and_params,
                               model_type, mesh_shape):
    model, params = (dense_and_params if model_type == "unet"
                     else tpu_dense_and_params)
    n_data, n_space = mesh_shape
    mesh = make_spatial_mesh(n_data, n_space)
    h = 8 * n_space * 2          # two rows per device at the deepest stage
    x = _rand_batch(n_data * 2, h, 64)

    dense = jax.jit(lambda p, a: model.apply({"params": p}, a))(params, x)
    fwd = build_spatial_forward(mesh, (h, 64), dtype=jnp.float32,
                                model_type=model_type)
    sharded = fwd(params, x)

    assert sharded.shape == (x.shape[0], 2 * h, 128, 1)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-4, atol=3e-5)


@pytest.mark.parametrize("model_type", ["edsr", "simple"])
def test_trunk_families_match_dense_forward(model_type):
    """edsr/simple row-sharded forwards: constant-resolution trunks whose
    only collectives are kxk halo exchanges (simple's 9x9 extract takes
    4-row halos; edsr has no GroupNorm, so no psums at all)."""
    model = build_model(ModelConfig(model_type=model_type, base_filters=16),
                        dtype=jnp.float32)
    params = init_params(model, jax.random.key(2), (32, 32))
    mesh = make_spatial_mesh(2, 4)
    h = 8 * 4                    # 8 local rows > simple's 4-row halo
    x = _rand_batch(4, h, 64, seed=3)

    dense = jax.jit(lambda p, a: model.apply({"params": p}, a))(params, x)
    fwd = build_spatial_forward(mesh, (h, 64), dtype=jnp.float32,
                                model_type=model_type)
    sharded = fwd(params, x)

    assert sharded.shape == (4, 2 * h, 128, 1)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-4, atol=3e-5)


def test_bf16_as_accurate_as_dense_bf16(dense_and_params):
    """bf16 reduction orders differ between the sharded and dense paths, so
    outputs aren't bitwise equal — the meaningful property is that the
    sharded bf16 path is no further from the fp32 truth than the dense bf16
    path is."""
    model_bf16 = UNetSuperRes(base_filters=16, dtype=jnp.bfloat16)
    model_fp32, params = dense_and_params
    mesh = make_spatial_mesh(2, 4)
    x = _rand_batch(4, 64, 64, seed=1)

    truth = np.asarray(jax.jit(
        lambda p, a: model_fp32.apply({"params": p}, a))(params, x))
    dense16 = np.asarray(jax.jit(
        lambda p, a: model_bf16.apply({"params": p}, a))(params, x))
    fwd = build_spatial_forward(mesh, (64, 64), dtype=jnp.bfloat16)
    sharded16 = np.asarray(fwd(params, x))

    err_sharded = np.abs(sharded16 - truth)
    err_dense = np.abs(dense16 - truth)
    assert err_sharded.mean() <= 2.0 * err_dense.mean() + 1e-4
    assert np.quantile(err_sharded, 0.999) <= \
        2.0 * np.quantile(err_dense, 0.999) + 1e-3


def test_shape_validation():
    mesh = make_spatial_mesh(2, 4)
    with pytest.raises(ValueError, match="divisible by 8\\*n_space"):
        build_spatial_forward(mesh, (40, 64))
    with pytest.raises(ValueError, match="divisible by 8"):
        build_spatial_forward(mesh, (64, 60))


@pytest.mark.parametrize("model_type", ["unet", "unet_tpu"])
def test_engine_spatial_path_matches_dense(dense_and_params,
                                           tpu_dense_and_params, model_type):
    """InferenceEngine(spatial_shards=4) serves the same outputs as the
    default batch-DP engine on conforming sizes (H | 8*shards), for both
    supported families."""
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    _, params = (dense_and_params if model_type == "unet"
                 else tpu_dense_and_params)
    cfg = ModelConfig(model_type=model_type, base_filters=16)
    dense_eng = InferenceEngine(cfg, params, bf16=False, num_devices=8)
    sp_eng = InferenceEngine(cfg, params, bf16=False, num_devices=8,
                             spatial_shards=4)
    batch = _rand_batch(4, 64, 64, seed=3)[..., 0]
    np.testing.assert_allclose(sp_eng.upscale_batch(batch),
                               dense_eng.upscale_batch(batch),
                               rtol=1e-4, atol=3e-5)


def test_engine_spatial_rejects_bad_config(dense_and_params):
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    _, params = dense_and_params
    with pytest.raises(ValueError, match="must divide"):
        InferenceEngine(ModelConfig(model_type="unet", base_filters=16),
                        params, num_devices=8, spatial_shards=3)
    # edsr/simple now have spatial topologies; only unknown types reject
    # (build_model raises before the engine's topology gate)
    with pytest.raises(ValueError, match="Unknown model type"):
        InferenceEngine(ModelConfig(model_type="hourglass",
                                    base_filters=16),
                        params, num_devices=8, spatial_shards=4)


def test_torch_checkpoint_params_work(dense_and_params):
    """The spatial forward consumes the SAME param tree as the dense model,
    so converted reference checkpoints run unmodified — pin the tree
    contract by round-tripping params through it."""
    model, params = dense_and_params
    mesh = make_spatial_mesh(1, 8)
    x = _rand_batch(1, 64, 64, seed=2)
    fwd = build_spatial_forward(mesh, (64, 64), dtype=jnp.float32)
    out = fwd(params, x)
    dense = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=1e-4, atol=3e-5)


# ------------------------------------------------- spatially-sharded TRAINING

class TestSpatialTraining:
    """build_spatial_loss / build_spatial_train_step: the forward, the
    CombinedLoss (L1 + SSIM + optional sharded VGG) and the BACKWARD all run
    row-sharded; losses and gradients must match the dense path to fp32
    reduction tolerance."""

    H, W = 64, 64

    def _batch(self, n=4, seed=0):
        rng = np.random.default_rng(seed)
        return {"lr": rng.random((n, self.H, self.W, 1), np.float32),
                "hr": rng.random((n, 2 * self.H, 2 * self.W, 1), np.float32),
                "weight": np.array([1, 1, 1, 0.0], np.float32)}

    @pytest.mark.parametrize("model_type", ["unet", "unet_tpu"])
    def test_loss_and_grads_match_dense(self, dense_and_params,
                                        tpu_dense_and_params, model_type):
        from mri_superresolution_tpu.config import LossConfig
        from mri_superresolution_tpu.losses import CombinedLoss
        from mri_superresolution_tpu.parallel import build_spatial_loss

        model, params = (dense_and_params if model_type == "unet"
                         else tpu_dense_and_params)
        mesh = make_spatial_mesh(2, 4)
        cfg = LossConfig(ssim_weight=0.3)
        b = self._batch()
        hr, lo = jnp.asarray(b["hr"]), jnp.asarray(b["lr"])
        w = jnp.asarray(b["weight"])

        dense_loss = CombinedLoss(cfg)

        def dense_fn(p):
            out = model.apply({"params": p}, lo)
            return dense_loss(out, hr, sample_weights=w)[0]

        sl = build_spatial_loss(mesh, (self.H, self.W), cfg, model_type,
                                jnp.float32)
        (dl, dg) = jax.jit(jax.value_and_grad(dense_fn))(params)
        (sv, sg) = jax.jit(jax.value_and_grad(
            lambda p: sl(p, hr, lo, w)[0]))(params)

        np.testing.assert_allclose(float(dl), float(sv), rtol=1e-5)
        from jax.flatten_util import ravel_pytree
        fd, _ = ravel_pytree(dg)
        fs, _ = ravel_pytree(sg)
        # post-Adam params are NOT a fair target (step-1 Adam ~ sign(g)*lr
        # amplifies reduction noise on near-zero grads) — compare grads.
        assert np.abs(np.asarray(fd) - np.asarray(fs)).max() < 1e-4

    def test_perceptual_term_sharded_matches_dense(self, dense_and_params):
        """The VGG stack itself runs row-sharded (1-row conv halos, local
        pools); loss values and gradients must match the dense perceptual
        path."""
        from mri_superresolution_tpu.config import LossConfig
        from mri_superresolution_tpu.losses import CombinedLoss
        from mri_superresolution_tpu.models import vgg as vgg_mod
        from mri_superresolution_tpu.parallel import build_spatial_loss

        model, params = dense_and_params
        mesh = make_spatial_mesh(2, 4)
        vggp = vgg_mod.random_params(jax.random.key(1), 8)
        cfg = LossConfig(ssim_weight=0.3, perceptual_weight=0.1,
                         vgg_layer_idx=8)
        b = self._batch(seed=2)
        hr, lo = jnp.asarray(b["hr"]), jnp.asarray(b["lr"])
        w = jnp.asarray(b["weight"])

        dense_loss = CombinedLoss(cfg, vgg_params=vggp)

        def dense_fn(p):
            out = model.apply({"params": p}, lo)
            total, comps = dense_loss(out, hr, sample_weights=w)
            return total, comps

        sl = build_spatial_loss(mesh, (self.H, self.W), cfg, "unet",
                                jnp.float32, vgg_params=vggp)
        (dl, dc), dg = jax.jit(jax.value_and_grad(dense_fn,
                                                  has_aux=True))(params)
        (sv, sc), sg = jax.jit(jax.value_and_grad(
            lambda p: sl(p, hr, lo, w)[:2], has_aux=True))(params)

        np.testing.assert_allclose(float(dl), float(sv), rtol=1e-5)
        np.testing.assert_allclose(float(dc["perceptual_loss"]),
                                   float(sc["perceptual_loss"]), rtol=1e-5)
        from jax.flatten_util import ravel_pytree
        fd, _ = ravel_pytree(dg)
        fs, _ = ravel_pytree(sg)
        assert np.abs(np.asarray(fd) - np.asarray(fs)).max() < 1e-4

    @pytest.mark.parametrize("model_type", ["unet", "unet_tpu"])
    def test_train_step_matches_dense(self, dense_and_params,
                                      tpu_dense_and_params, model_type):
        """One full optimizer step (augmentation ON, shared key): metrics
        identical, updated params within Adam's noise floor of the dense
        step's."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from mri_superresolution_tpu.config import AugmentConfig, LossConfig
        from mri_superresolution_tpu.losses import CombinedLoss
        from mri_superresolution_tpu.parallel import (build_spatial_loss,
                                                      replicated_sharding)
        from mri_superresolution_tpu.train.trainer import (
            TrainState, build_spatial_train_step, build_train_step,
            make_optimizer)

        model, params = (dense_and_params if model_type == "unet"
                         else tpu_dense_and_params)
        mesh = make_spatial_mesh(2, 4)
        cfg = LossConfig(ssim_weight=0.3)
        aug = AugmentConfig(enabled=True)
        opt = make_optimizer(1e-5)
        b = self._batch(seed=3)
        lr_s = jnp.asarray(1e-4, jnp.float32)
        key = jax.random.key(5)

        def fresh():
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              opt_state=opt.init(params))

        dense_step = jax.jit(build_train_step(model, CombinedLoss(cfg), opt,
                                              aug, cfg))
        ds, dm = dense_step(fresh(), {k: jnp.asarray(v)
                                      for k, v in b.items()}, lr_s, key)

        sl = build_spatial_loss(mesh, (self.H, self.W), cfg, model_type,
                                jnp.float32)
        rsh = replicated_sharding(mesh)
        x4 = NamedSharding(mesh, P("data", "space"))
        dsh = {"hr": x4, "lr": x4, "weight": NamedSharding(mesh, P("data"))}
        sp_step = jax.jit(build_spatial_train_step(sl, opt, aug),
                          in_shardings=(rsh, dsh, None, None),
                          out_shardings=(rsh, rsh))
        ss, sm = sp_step(jax.device_put(fresh(), rsh), b, lr_s, key)

        np.testing.assert_allclose(float(dm["loss"]), float(sm["loss"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(dm["ssim"]), float(sm["ssim"]),
                                   rtol=1e-3, atol=1e-5)
        from jax.flatten_util import ravel_pytree
        fd, _ = ravel_pytree(ds.params)
        fs, _ = ravel_pytree(ss.params)
        # |param diff| is bounded by 2*lr where reduction noise flips a
        # near-zero gradient's Adam direction; most entries agree far tighter.
        diff = np.abs(np.asarray(fd) - np.asarray(fs))
        assert diff.max() <= 2.5e-4          # 2.5 * lr
        assert np.quantile(diff, 0.99) <= 5e-5
        assert int(ss.step) == 1

    def test_remat_spatial_loss_matches(self, dense_and_params):
        """jax.checkpoint composes with the shard_map loss: same losses and
        gradients, backward just re-runs the sharded forward."""
        from mri_superresolution_tpu.config import LossConfig
        from mri_superresolution_tpu.parallel import build_spatial_loss

        _, params = dense_and_params
        mesh = make_spatial_mesh(2, 4)
        cfg = LossConfig(ssim_weight=0.3)
        b = self._batch(seed=7)
        hr, lo = jnp.asarray(b["hr"]), jnp.asarray(b["lr"])
        w = jnp.asarray(b["weight"])

        outs = []
        for remat in (False, True):
            sl = build_spatial_loss(mesh, (self.H, self.W), cfg, "unet",
                                    jnp.float32, remat=remat)
            outs.append(jax.jit(jax.value_and_grad(
                lambda p: sl(p, hr, lo, w)[0]))(params))
        (v0, g0), (v1, g1) = outs
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        from jax.flatten_util import ravel_pytree
        f0, _ = ravel_pytree(g0)
        f1, _ = ravel_pytree(g1)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                                   rtol=1e-5, atol=1e-6)

    def test_grad_accum_composes_with_spatial_step(self, dense_and_params):
        """--grad_accum scans microbatches OVER the shard_map loss: one
        accum=2 optimizer step must match the accum=1 spatial step (exact
        weighted-mean recombination; the 2x2-device mesh stays fixed)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from mri_superresolution_tpu.config import AugmentConfig, LossConfig
        from mri_superresolution_tpu.parallel import (build_spatial_loss,
                                                      replicated_sharding)
        from mri_superresolution_tpu.train.trainer import (
            TrainState, build_spatial_train_step, make_optimizer)

        _, params = dense_and_params
        mesh = make_spatial_mesh(2, 4)
        cfg = LossConfig(ssim_weight=0.3)
        opt = make_optimizer(1e-5)
        b = self._batch(seed=9)
        lr_s = jnp.asarray(1e-4, jnp.float32)
        key = jax.random.key(6)

        sl = build_spatial_loss(mesh, (self.H, self.W), cfg, "unet",
                                jnp.float32)
        rsh = replicated_sharding(mesh)
        x4 = NamedSharding(mesh, P("data", "space"))
        dsh = {"hr": x4, "lr": x4, "weight": NamedSharding(mesh, P("data"))}

        outs = {}
        for accum in (1, 2):
            step = jax.jit(
                build_spatial_train_step(sl, opt,
                                         AugmentConfig(enabled=True),
                                         grad_accum=accum),
                in_shardings=(rsh, dsh, None, None),
                out_shardings=(rsh, rsh))
            state = jax.device_put(
                TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=opt.init(params)), rsh)
            outs[accum] = step(state, b, lr_s, key)

        (s1, m1), (s2, m2) = outs[1], outs[2]
        np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(m2["ssim"]), float(m1["ssim"]),
                                   rtol=1e-6)
        from jax.flatten_util import ravel_pytree
        f1, _ = ravel_pytree(s1.params)
        f2, _ = ravel_pytree(s2.params)
        diff = np.abs(np.asarray(f2) - np.asarray(f1))
        # reassociated fp32 reductions + step-1 Adam: isolated +-lr flips
        assert diff.max() <= 2.5e-4, float(diff.max())
        assert np.quantile(diff, 0.99) <= 5e-5

    def test_spatial_loss_config_validation(self):
        """Shard-incompatible loss configs fail at BUILD time with
        ValueError, not mid-trace (code-review r3 findings: a too-deep SSIM
        halo silently truncates; odd VGG pool rows silently drop a row)."""
        from mri_superresolution_tpu.config import LossConfig
        from mri_superresolution_tpu.models import vgg as vgg_mod
        from mri_superresolution_tpu.parallel import build_spatial_loss

        mesh8 = make_spatial_mesh(1, 8)
        with pytest.raises(ValueError, match="odd"):
            build_spatial_loss(mesh8, (64, 64), LossConfig(window_size=10))
        with pytest.raises(ValueError, match="halo"):
            build_spatial_loss(mesh8, (64, 64), LossConfig(window_size=35))
        # 96 % (8*4) == 0 passes the H check, but local HR rows = 48 are
        # not divisible by the 2^5 pools crossed at vgg_layer_idx=36
        mesh4 = make_spatial_mesh(2, 4)
        vggp = vgg_mod.random_params(jax.random.key(0), 8)
        with pytest.raises(ValueError, match="pools"):
            build_spatial_loss(
                mesh4, (96, 96),
                LossConfig(perceptual_weight=0.1, vgg_layer_idx=36),
                vgg_params=vggp)

    def test_trainer_rejects_bad_spatial_config(self, tmp_path):
        from mri_superresolution_tpu.config import ModelConfig, TrainConfig
        from mri_superresolution_tpu.train import train

        base = dict(full_res_dir=str(tmp_path), low_res_dir=str(tmp_path),
                    checkpoint_dir=str(tmp_path / "ckpt"),
                    log_dir=str(tmp_path / "logs"))
        with pytest.raises(ValueError, match="must divide"):
            train(TrainConfig(spatial_shards=3, **base))
        # every registered family now has a spatial topology (edsr/simple
        # included), so only an unknown type rejects
        with pytest.raises(ValueError, match="supports model types"):
            train(TrainConfig(spatial_shards=4,
                              model=ModelConfig(model_type="hourglass"),
                              **base))


def test_engine_spatial_padding_warns(caplog, dense_and_params):
    """Non-conforming sizes under spatial sharding are zero-padded, which
    perturbs whole-image GroupNorm stats — the engine must say so
    (VERDICT r2 item 8)."""
    import logging
    from mri_superresolution_tpu.config import ModelConfig
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    _, params = dense_and_params
    cfg = ModelConfig(model_type="unet", base_filters=16)
    eng = InferenceEngine(cfg, params, bf16=False, num_devices=8,
                          spatial_shards=4)
    eng_logger = logging.getLogger("mri_superresolution_tpu.infer")
    eng_logger.addHandler(caplog.handler)
    try:
        out = eng.upscale_batch(_rand_batch(2, 40, 40, seed=5)[..., 0])
    finally:
        eng_logger.removeHandler(caplog.handler)
    assert out.shape == (2, 80, 80)            # cropped back to 2x input
    warns = [r.message for r in caplog.records
             if r.levelno >= logging.WARNING and "GroupNorm" in r.message]
    assert warns and "40x40" in warns[0] and "64x40" in warns[0]

    # conforming sizes must NOT warn
    caplog.clear()
    eng_logger.addHandler(caplog.handler)
    try:
        eng.upscale_batch(_rand_batch(2, 64, 64, seed=6)[..., 0])
    finally:
        eng_logger.removeHandler(caplog.handler)
    assert not [r for r in caplog.records
                if r.levelno >= logging.WARNING and "GroupNorm" in r.message]


def test_tta_composes_with_spatial_serving(dense_and_params):
    """tta=True over the row-sharded engine path: flip-equivariant by
    construction, correct shape, finite."""
    from mri_superresolution_tpu.config import ModelConfig
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    _, params = dense_and_params
    eng = InferenceEngine(ModelConfig(base_filters=16), params, bf16=False,
                          num_devices=8, spatial_shards=2, tta=True)
    rng = np.random.default_rng(3)
    x = rng.random((2, 32, 32), dtype=np.float32)
    y = eng.upscale_batch(x)
    assert y.shape == (2, 64, 64) and np.isfinite(y).all()
    yf = eng.upscale_batch(np.ascontiguousarray(x[:, ::-1]))
    np.testing.assert_allclose(yf[:, ::-1], y, rtol=1e-5, atol=1e-6)


# ---------------------------------------------- int8 x spatial serving (r5)
# VERDICT r4 item 3: the last serving-matrix hole. The frozen per-channel
# scales fold into the row-sharded forward with halos exchanged AFTER the
# quantize, so the s8 x s8 -> s32 arithmetic is bit-identical to the dense
# int8 forward per output pixel; only the surrounding GroupNorms (psum-
# reordered fp32/bf16) differ, bounded by the same tolerance as the bf16
# spatial-vs-dense tests.


def _quant_model_and_params(model_type):
    cfg = ModelConfig(model_type=model_type, base_filters=16)
    model = build_model(cfg, dtype=jnp.float32)
    params = init_params(model, jax.random.key(0), (32, 32))
    return cfg, params


def _assert_int8_quality(sp, dense, truth):
    """Dense-vs-spatial int8 equivalence is NOT elementwise for the
    GroupNorm families: a single quantizer code flip (fp32 sum-order ULPs
    at a half-code boundary) shifts the next GN's WHOLE-IMAGE mean, which
    perturbs every pixel and flips more codes — a measured cascade (the
    same mechanism as the QAT/grad-accum flip fraction, CLAUDE.md), so
    allclose between the two int8 paths is data-dependently chaotic.
    The serving contract that matters — and is tight (measured ratio
    0.995-1.000 across families/shapes/seeds) — is QUALITY: the
    row-sharded int8 forward sits as close to the fp32 truth as the dense
    int8 forward does."""
    e_sp = np.abs(np.asarray(sp, np.float32) - np.asarray(truth, np.float32))
    e_d = np.abs(np.asarray(dense, np.float32)
                 - np.asarray(truth, np.float32))
    assert e_sp.mean() <= 1.1 * e_d.mean() + 1e-5, \
        f"mean {e_sp.mean()} vs dense {e_d.mean()}"
    assert np.quantile(e_sp, 0.999) <= 1.2 * np.quantile(e_d, 0.999) + 1e-3


def _assert_int8_close(a, b):
    """Sparse-flip contract for SAME-path comparisons (e.g. the TTA
    ensemble's flip equivariance): almost all pixels match tightly,
    flipped pixels are rare and bounded by a few quantization steps."""
    d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
    assert d.mean() < 1e-4, f"mean err {d.mean()}"
    assert (d > 1e-3).mean() < 0.01, f"flip fraction {(d > 1e-3).mean()}"
    assert d.max() < 0.1, f"max err {d.max()}"


@pytest.mark.parametrize("model_type", ["unet", "unet_tpu", "edsr", "simple"])
def test_spatial_int8_matches_dense_int8(model_type):
    from mri_superresolution_tpu.models import quant_forward as qf
    from mri_superresolution_tpu.parallel import (
        build_spatial_calib_forward_raw, build_spatial_int8_forward_raw)

    cfg, params = _quant_model_and_params(model_type)
    x = jnp.asarray(_rand_batch(2, 32, 32, seed=5))
    model = build_model(cfg, dtype=jnp.float32)
    truth = np.asarray(jax.jit(
        lambda p, a: model.apply({"params": p}, a))(params, x))
    scales = qf.calibrate(params, [np.asarray(x)], model_type,
                          dtype=jnp.float32)
    dense = np.asarray(jax.jit(qf.build_int8_forward(
        params, scales, model_type, dtype=jnp.float32))(params, x))
    mesh = make_spatial_mesh(2, 4)
    raw = build_spatial_int8_forward_raw(mesh, (32, 32), params, scales,
                                         model_type, dtype=jnp.float32)
    sp = np.asarray(jax.jit(raw)(params, x))
    if model_type in ("edsr", "simple"):
        # no GroupNorm: integer convs + elementwise ops only -> bit-exact
        np.testing.assert_array_equal(sp, dense)
    else:
        _assert_int8_quality(sp, dense, truth)

    # the calib forward's pmax'd statistic equals the dense max exactly
    # (max is reorder-invariant; fp32 forward)
    sites = sorted(qf.amax_template(params, (1, 32, 32, 1), model_type,
                                    dtype=jnp.float32))
    _, amax_sp = jax.jit(build_spatial_calib_forward_raw(
        mesh, (32, 32), sites, model_type, dtype=jnp.float32))(params, x)
    amax_dense = qf.calib_amax(params, x, model_type, dtype=jnp.float32)
    assert sorted(amax_dense) == sites
    for k in sites:
        np.testing.assert_allclose(np.asarray(amax_sp[k]),
                                   np.asarray(amax_dense[k]),
                                   rtol=1e-5, atol=1e-6)


def test_engine_spatial_int8_frozen_sidecar_matches_dense(tmp_path):
    """Engines built from the same frozen sidecar serve ~the same int8
    outputs dense and row-sharded, and both serve int8 from batch 0."""
    from mri_superresolution_tpu.infer.engine import InferenceEngine
    from mri_superresolution_tpu.models import quant_forward as qf

    cfg, params = _quant_model_and_params("unet")
    rich = _rand_batch(4, 64, 64, seed=6)[..., 0]
    scales = qf.calibrate(params, [rich[..., None]], "unet",
                          dtype=jnp.float32)
    sidecar = str(tmp_path / "scales.calib.json")
    qf.save_scales(sidecar, scales, "unet")

    dense_eng = InferenceEngine(cfg, params, bf16=False, num_devices=8,
                                quant="int8", quant_calib_path=sidecar)
    sp_eng = InferenceEngine(cfg, params, bf16=False, num_devices=8,
                             spatial_shards=4, quant="int8",
                             quant_calib_path=sidecar)
    yd = dense_eng.upscale_batch(rich)
    ys = sp_eng.upscale_batch(rich)
    assert dense_eng._quant_batches["int8"] == 1
    assert sp_eng._quant_batches["int8"] == 1
    truth = InferenceEngine(cfg, params, bf16=False,
                            num_devices=8).upscale_batch(rich)
    _assert_int8_quality(ys, yd, truth)


def test_engine_spatial_int8_streaming_calibration():
    """The row-sharded engine self-calibrates while serving bf16, freezes,
    then serves int8 — the dense state machine on the spatial forwards."""
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    cfg, params = _quant_model_and_params("unet")
    rich = _rand_batch(4, 64, 64, seed=7)[..., 0]
    sp_eng = InferenceEngine(cfg, params, bf16=False, num_devices=8,
                             spatial_shards=4, quant="int8",
                             quant_calib_slices=4)
    assert sp_eng.quant_calibrating
    y0 = sp_eng.upscale_batch(rich)       # calibrates AND re-serves int8
    assert not sp_eng.quant_calibrating
    assert sp_eng._quant_batches["int8"] == 1
    assert "scales frozen" in sp_eng.quant_summary()

    # frozen scales equal a dense engine's on the same data (fp32 calib
    # forward; max is reorder-invariant)
    dense_eng = InferenceEngine(cfg, params, bf16=False, num_devices=8,
                                quant="int8", quant_calib_slices=4)
    dense_eng.upscale_batch(rich)
    for k, v in dense_eng._quant_scales.items():
        np.testing.assert_allclose(np.asarray(sp_eng._quant_scales[k]),
                                   np.asarray(v), rtol=1e-5, atol=1e-7)
    truth = InferenceEngine(cfg, params, bf16=False,
                            num_devices=8).upscale_batch(rich)
    _assert_int8_quality(y0, dense_eng.upscale_batch(rich), truth)


def test_engine_spatial_int8_routes_near_empty_to_bf16(tmp_path):
    """The content guardrail survives sharding: a near-empty batch serves
    on the exact bf16 spatial path (identical to a no-quant engine)."""
    from mri_superresolution_tpu.infer.engine import InferenceEngine
    from mri_superresolution_tpu.models import quant_forward as qf

    cfg, params = _quant_model_and_params("unet")
    rich = _rand_batch(2, 64, 64, seed=8)[..., 0]
    empty = np.zeros((2, 64, 64), np.float32)
    empty[:, 30:32, 30:32] = 1.0          # ~0.1% foreground
    scales = qf.calibrate(params, [rich[..., None]], "unet",
                          dtype=jnp.float32)
    sidecar = str(tmp_path / "scales.calib.json")
    qf.save_scales(sidecar, scales, "unet")

    base = InferenceEngine(cfg, params, bf16=False, num_devices=8,
                           spatial_shards=4)
    qeng = InferenceEngine(cfg, params, bf16=False, num_devices=8,
                           spatial_shards=4, quant="int8",
                           quant_calib_path=sidecar)
    np.testing.assert_array_equal(qeng.upscale_batch(empty),
                                  base.upscale_batch(empty))
    assert qeng._quant_batches["bf16"] == 1
    assert qeng._quant_batches["int8"] == 0


def test_tta_composes_with_spatial_int8(tmp_path):
    """Frozen-scale int8 + spatial + TTA runs the on-device ensemble
    around the row-sharded int8 forward: flip-equivariant, finite, and
    counted as ONE int8 batch."""
    from mri_superresolution_tpu.infer.engine import InferenceEngine
    from mri_superresolution_tpu.models import quant_forward as qf

    cfg, params = _quant_model_and_params("unet")
    rich = _rand_batch(2, 32, 32, seed=9)[..., 0]
    scales = qf.calibrate(params, [rich[..., None]], "unet",
                          dtype=jnp.float32)
    sidecar = str(tmp_path / "scales.calib.json")
    qf.save_scales(sidecar, scales, "unet")

    eng = InferenceEngine(cfg, params, bf16=False, num_devices=8,
                          spatial_shards=2, quant="int8",
                          quant_calib_path=sidecar, tta=True)
    assert eng._tta_on_device()
    y = eng.upscale_batch(rich)
    assert y.shape == (2, 64, 64) and np.isfinite(y).all()
    assert eng._quant_batches["int8"] == 1
    yf = eng.upscale_batch(np.ascontiguousarray(rich[:, ::-1]))
    _assert_int8_close(yf[:, ::-1], y)


def test_engine_spatial_int8_bad_sidecar_fails_at_init(tmp_path):
    """A truncated/mismatched sidecar must fail at CONSTRUCTION on the
    spatial path too (review r5 finding: it used to surface only at the
    first served batch, after clients connected)."""
    from mri_superresolution_tpu.infer.engine import InferenceEngine
    from mri_superresolution_tpu.models import quant_forward as qf

    cfg, params = _quant_model_and_params("unet")
    scales = qf.calibrate(params, [np.zeros((1, 32, 32, 1), np.float32)],
                          "unet", dtype=jnp.float32)
    scales.pop("inc.conv1")                      # truncate
    sidecar = str(tmp_path / "bad.calib.json")
    qf.save_scales(sidecar, scales, "unet")
    with pytest.raises(ValueError, match="missing for sites"):
        InferenceEngine(cfg, params, bf16=False, num_devices=8,
                        spatial_shards=4, quant="int8",
                        quant_calib_path=sidecar)
