"""Quantization-aware training (--qat) for the int8 serving path.

Layers tested bottom-up: the STE primitive, per-site fake-quant ==
int8-serving-conv equivalence (ops/quant.py), the whole-net fakequant
forward vs build_int8_forward (models/quant_forward.py), gradient flow
through the quantizers, the trainer's running-amax EMA state, grad_accum
composition, and the end-to-end contract: train --qat -> checkpoint +
frozen calibration sidecar -> load_engine auto-serves int8 with the
trained scales. The reference has no quantized training (fp16 autocast
only, scripts/train.py:158-163); this is a TPU-native extension on top of
the PTQ path (RESULTS.md 2b measured PTQ at -0.64/-0.75 dB — QAT exists
to claw that back).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from mri_superresolution_tpu.config import ModelConfig
from mri_superresolution_tpu.models import build_model
from mri_superresolution_tpu.models import quant_forward as qf
from mri_superresolution_tpu.ops.quant import (fake_quant_act,
                                               fake_quant_kernel, int8_conv,
                                               quantize_tensor, ste,
                                               weight_qparams)

from test_train import _make_dataset, _tiny_config


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def _model_and_params(model_type, base_filters=16, dtype=jnp.float32):
    model = build_model(ModelConfig(model_type=model_type,
                                    base_filters=base_filters), dtype=dtype)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 32, 32, 1)))["params"]
    return model, params


# ------------------------------------------------------------- primitives

def test_ste_forward_is_quantized_gradient_is_identity():
    x = jnp.asarray([-1.0, 0.3, 2.0])

    def f(x):
        return jnp.sum(ste(x, jnp.round(x)) ** 2)

    # forward sees round(x), backward differentiates x**2 at round(x)
    # with d(round)/dx treated as identity: grad = 2 * round(x)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                               2.0 * np.round(np.asarray(x)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ste(x, jnp.round(x))),
                               np.round(np.asarray(x)))


def test_fake_quant_site_matches_int8_conv(rng):
    """conv(fake_quant_act(x), fake_quant_kernel(w)) must equal the int8
    serving conv (folded scales, s8xs8->s32) up to fp32 summation order —
    the contract that makes QAT train against the ACTUAL serving
    arithmetic."""
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 12)).astype(np.float32))
    s_a = jnp.asarray(np.abs(np.asarray(x)).max(axis=(0, 1, 2)) / 127.0)

    want = int8_conv(quantize_tensor(x, s_a),
                     *weight_qparams(k, act_scale=s_a),
                     padding=1, out_dtype=jnp.float32)
    got = lax.conv_general_dilated(
        fake_quant_act(x, s_a), fake_quant_kernel(k, s_a), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_fake_quant_zero_channel_guard():
    x = jnp.zeros((1, 4, 4, 3))
    k = jnp.zeros((3, 3, 3, 2))
    s = jnp.ones((3,))
    assert np.isfinite(np.asarray(fake_quant_act(x, s))).all()
    assert np.isfinite(np.asarray(fake_quant_kernel(k, s))).all()


# ------------------------------------------------------------ whole-model

N_QAT_SITES = {"unet": 20, "unet_tpu": 20, "edsr": 18, "simple": 2}


@pytest.mark.parametrize("model_type",
                         ["unet", "unet_tpu", "edsr", "simple"])
def test_fakequant_forward_tracks_int8_forward(model_type, rng):
    """The QAT forward and the int8 serving forward share scales, so their
    outputs track closely; per-site they are summation-order-equal (test
    above) — whole-net differences come from one-code rounding flips
    amplified through GroupNorm, bounded like the PTQ noise itself."""
    _, params = _model_and_params(model_type)
    x = jnp.asarray(rng.random((2, 32, 32, 1), np.float32))
    amax = qf.calib_amax(params, x, model_type, jnp.float32)
    assert len(amax) == N_QAT_SITES[model_type] and "__out__" not in amax

    scales = qf.scales_from_amax(jax.device_get(amax))
    y_int8 = np.asarray(jax.jit(qf.build_int8_forward(
        params, scales, model_type, jnp.float32))(params, x))
    fq = qf.build_fakequant_forward(model_type, jnp.float32)
    y_fq, batch_amax, any_fg = jax.jit(fq)(params, amax, x)

    assert bool(any_fg)
    assert set(batch_amax) == set(amax)        # same quantized sites
    # same random-weights noise bound as the PTQ test (test_quant.py)
    assert np.mean(np.abs(np.asarray(y_fq) - y_int8)) < 0.05
    # the FIRST site's input is the raw image in both forwards, so its
    # batch statistic matches the calib forward's exactly; downstream
    # sites see quantized activations and legitimately differ
    first = {"unet": "inc.conv1", "unet_tpu": "inc.conv1",
             "edsr": "head", "simple": "extract"}[model_type]
    np.testing.assert_allclose(np.asarray(batch_amax[first]),
                               np.asarray(amax[first]), rtol=1e-6)


def test_fakequant_gradients_flow_to_all_conv_kernels(rng):
    _, params = _model_and_params("unet")
    x = jnp.asarray(rng.random((1, 32, 32, 1), np.float32))
    amax = qf.calib_amax(params, x, "unet", jnp.float32)
    fq = qf.build_fakequant_forward("unet", jnp.float32)

    def loss(p):
        y, _, _ = fq(p, amax, x)
        return jnp.mean((y - 0.8) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    kernel_norms = {jax.tree_util.keystr(kp): float(jnp.sum(jnp.abs(l)))
                    for kp, l in flat if "kernel" in jax.tree_util.keystr(kp)}
    assert kernel_norms, "no conv kernels in gradient tree"
    zero = [k for k, v in kernel_norms.items() if v == 0.0]
    assert not zero, f"STE blocked gradients at: {zero}"


def test_fakequant_foreground_routing(rng):
    """Per-sample near-empty routing mirrors the serving engine's bf16
    guardrail AND is the numerical fix for a measured training divergence:
    a background slice quantized to exact constants has zero GroupNorm
    variance at EVERY layer, each GN backward multiplies by
    rsqrt(0+eps)~316, and ~18 GNs compound past fp32 range (NaN by step 2
    on real extracted data — volume-edge slices routinely have <5%%
    foreground)."""
    _, params = _model_and_params("unet")
    fg = rng.random((3, 32, 32, 1), np.float32)
    # near-blank volume-edge slice (every pixel below FOREGROUND_INTENSITY
    # -> foreground fraction 0). NOT exactly zero: at INIT an exactly-zero
    # sample NaNs even the unquantized baseline (GN bias inits to 0, the
    # whole forward is 0, all GN variances are 0 — parity-faithful torch
    # behavior, see CLAUDE.md numerical gotchas), so it can't be the
    # init-time routing probe.
    blank = rng.random((1, 32, 32, 1)).astype(np.float32) * 0.02
    mixed = jnp.asarray(np.concatenate([blank, fg]))
    hr = jnp.asarray(rng.random((4, 64, 64, 1), np.float32))
    amax = qf.calib_amax(params, jnp.asarray(fg), "unet", jnp.float32)
    fq = qf.build_fakequant_forward("unet", jnp.float32)

    # background sample excluded from the batch statistic
    _, a_mixed, fg_mixed = jax.jit(fq)(params, amax, mixed)
    _, a_fg, _ = jax.jit(fq)(params, amax, jnp.asarray(fg))
    assert bool(fg_mixed)
    for k in amax:
        np.testing.assert_allclose(np.asarray(a_mixed[k]),
                                   np.asarray(a_fg[k]), rtol=1e-6)

    # a batch with NO foreground records exact ZEROS and any_fg=False: the
    # trainer gates its EMA update on the flag (exact no-op — engine
    # parity: it never calibrates on background batches), and zeros are
    # the neutral element for the grad_accum cross-microbatch max (the
    # running value there would block the range from ever decaying on
    # steps containing a background microbatch)
    _, a_bg, fg_bg = jax.jit(fq)(params, amax, jnp.zeros((2, 32, 32, 1)))
    assert not bool(fg_bg)
    for k in amax:
        np.testing.assert_array_equal(np.asarray(a_bg[k]),
                                      np.zeros_like(np.asarray(amax[k])))

    # gradients through the mixed batch stay finite
    def loss(p):
        y, _, _ = fq(p, amax, mixed)
        return jnp.mean(jnp.abs(y - hr))

    g = jax.grad(loss)(params)
    assert all(bool(jnp.isfinite(l).all())
               for l in jax.tree_util.tree_leaves(g))

    # foreground samples still run the quantized forward (identical to an
    # all-foreground batch's outputs)
    y_mixed, _, _ = jax.jit(fq)(params, amax, mixed)
    y_fg, _, _ = jax.jit(fq)(params, amax, jnp.asarray(fg))
    np.testing.assert_allclose(np.asarray(y_mixed)[1:], np.asarray(y_fg),
                               rtol=1e-5, atol=1e-6)


def test_qat_training_with_blank_slices_stays_finite(rng):
    """Multi-step regression for the measured divergence: batches
    containing blank and near-blank slices (volume edges) train finitely
    under QAT."""
    from mri_superresolution_tpu.train.trainer import (TrainState,
                                                       build_train_step,
                                                       make_optimizer)
    from mri_superresolution_tpu.config import LossConfig
    from mri_superresolution_tpu.losses.combined import CombinedLoss

    model, params = _model_and_params("unet")
    n = 16
    x = rng.random((n, 32, 32, 1), np.float32)
    # blank/near-blank slices AFTER the first batch: at init an
    # exactly-zero sample NaNs even the unquantized baseline (parity
    # behavior, CLAUDE.md); one optimizer step makes GN biases nonzero,
    # after which only the QAT constant-collapse (fixed by foreground
    # routing) threatened
    x[4] = 0.0                                      # fully black
    x[5] *= 0.02                                    # near-blank
    x[8] *= 0.03
    hr = rng.random((n, 64, 64, 1), np.float32)
    amax0 = qf.calib_amax(params, jnp.asarray(x[4:12]), "unet", jnp.float32)
    cfg = LossConfig(ssim_weight=0.3)
    opt = make_optimizer(1e-5)
    fq = qf.build_fakequant_forward("unet", jnp.float32)
    step = jax.jit(build_train_step(model, CombinedLoss(cfg), opt, None,
                                    cfg, qat_fwd=fq, qat_decay=0.9))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt.init(params), qat_amax=amax0)
    for i in range(4):
        sel = np.arange(i * 4, i * 4 + 4)
        batch = {"hr": jnp.asarray(hr[sel]), "lr": jnp.asarray(x[sel]),
                 "weight": jnp.ones((4,), jnp.float32)}
        state, m = step(state, batch, jnp.asarray(1e-3, jnp.float32),
                        jax.random.key(i))
        assert np.isfinite(float(m["loss"])), f"step {i} diverged"
    assert all(bool(jnp.isfinite(l).all())
               for l in jax.tree_util.tree_leaves(state.params))
    assert all(bool(jnp.isfinite(l).all()) and bool((l >= 0).all())
               for l in jax.tree_util.tree_leaves(state.qat_amax))


# ----------------------------------------------------------- train step

def test_qat_train_step_updates_running_amax(rng):
    from mri_superresolution_tpu.train.trainer import (TrainState,
                                                       build_train_step,
                                                       make_optimizer)
    from mri_superresolution_tpu.config import LossConfig
    from mri_superresolution_tpu.losses.combined import CombinedLoss

    model, params = _model_and_params("unet")
    x = jnp.asarray(rng.random((4, 32, 32, 1), np.float32))
    hr = jnp.asarray(rng.random((4, 64, 64, 1), np.float32))
    amax0 = qf.calib_amax(params, x, "unet", jnp.float32)
    cfg = LossConfig(ssim_weight=0.3)
    opt = make_optimizer(0.0)
    fq = qf.build_fakequant_forward("unet", jnp.float32)
    step = jax.jit(build_train_step(model, CombinedLoss(cfg), opt, None,
                                    cfg, qat_fwd=fq, qat_decay=0.9))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt.init(params), qat_amax=amax0)
    batch = {"hr": hr, "lr": x, "weight": jnp.ones((4,), jnp.float32)}
    new_state, metrics = step(state, batch, jnp.asarray(1e-3, jnp.float32),
                              jax.random.key(0))

    assert np.isfinite(float(metrics["loss"]))
    # EMA: new = 0.9*old + 0.1*batch, where batch is the statistic the
    # fakequant forward itself records (quantized activations — NOT the
    # calib forward's full-precision statistic)
    _, batch_amax, _ = jax.jit(fq)(params, amax0, x)
    for k, old in amax0.items():
        want = 0.9 * np.asarray(old) + 0.1 * np.asarray(batch_amax[k])
        new = np.asarray(new_state.qat_amax[k])
        np.testing.assert_allclose(new, want, rtol=1e-5)
        assert np.all(new >= 0)
    # params moved
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                               state.params, new_state.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_qat_grad_accum_equivalence(rng):
    """grad_accum composes with QAT exactly: every microbatch quantizes
    with the SAME step-start running amax, and the recombined batch
    statistic (max over micro maxima) equals the full-batch max."""
    from mri_superresolution_tpu.train.trainer import (TrainState,
                                                       build_train_step,
                                                       make_optimizer)
    from mri_superresolution_tpu.config import LossConfig
    from mri_superresolution_tpu.losses.combined import CombinedLoss

    model, params = _model_and_params("unet")
    x = jnp.asarray(rng.random((4, 32, 32, 1), np.float32))
    hr = jnp.asarray(rng.random((4, 64, 64, 1), np.float32))
    amax0 = qf.calib_amax(params, x, "unet", jnp.float32)
    cfg = LossConfig(ssim_weight=0.3)
    fq = qf.build_fakequant_forward("unet", jnp.float32)
    batch = {"hr": hr, "lr": x, "weight": jnp.ones((4,), jnp.float32)}

    def run(accum):
        opt = make_optimizer(0.0)
        step = jax.jit(build_train_step(model, CombinedLoss(cfg), opt, None,
                                        cfg, grad_accum=accum, qat_fwd=fq,
                                        qat_decay=0.9))
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=opt.init(params), qat_amax=amax0)
        return step(state, batch, jnp.asarray(1e-3, jnp.float32),
                    jax.random.key(0))

    (s1, m1), (s2, m2) = run(1), run(2)
    # Under QAT the accum/direct graphs are NOT elementwise-identical:
    # fp32 reassociation (scan-accumulated vs direct grads) moves values
    # across quantizer code boundaries, each flip discontinuously changing
    # sub-noise gradients whose SIGN then sets Adam's entire first-step
    # update (cap |m/sqrt(v)| <= 1 at step 1, so |dw| <= 2*lr). How many
    # elements sit on such plateau boundaries is environment-dependent
    # (XLA fusion choices shift it between <0.1% and ~6% on the same
    # machine). The robust invariants:
    # 1. the loss/ssim metrics agree to quantization dilution (~1e-4),
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-3
    assert abs(float(m1["ssim"]) - float(m2["ssim"])) < 1e-3
    # 2. the recombined amax statistic matches to ONE quantization code
    #    (1/127 ~ 0.8% — the max-over-micro-maxima recombination is exact
    #    max algebra, but the activations being maxed sit downstream of
    #    quantizers whose codes the reassociation can flip),
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2),
        s1.qat_amax, s2.qat_amax)
    # 3. every weight delta is within the Adam first-step cap (2*lr;
    #    a systematic scaling/averaging bug would not be), and
    # 4. the flipped fraction stays small (a real recombination bug moves
    #    essentially EVERY element past the threshold).
    lr = 1e-3
    mismatch = total = 0
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        a, b = np.asarray(a), np.asarray(b)
        assert float(np.max(np.abs(a - b))) <= 2.2 * lr
        mismatch += int((np.abs(a - b) > 5e-5 + 2e-3 * np.abs(b)).sum())
        total += a.size
    assert mismatch / total < 0.15, f"{mismatch}/{total} elements differ"


# ------------------------------------------------------------- end-to-end

def test_qat_train_end_to_end_sidecar_and_int8_serving(tmp_path, capsys):
    """train --qat produces a checkpoint + frozen calibration sidecar; the
    engine auto-loads the sidecar for --quant int8 and serves int8 from
    batch 0, deterministically across processes."""
    pytest.importorskip("cv2")
    from mri_superresolution_tpu.config import InferConfig
    from mri_superresolution_tpu.infer.engine import load_engine
    from mri_superresolution_tpu.train.trainer import train

    hr_dir, lr_dir = _make_dataset(tmp_path)
    cfg = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=2, qat=True,
                       qat_decay=0.9)
    final = train(cfg)
    out = capsys.readouterr().out
    assert "QAT enabled" in out
    assert os.path.exists(final)

    base = final[:-len(".ckpt")]
    sidecar = base + ".calib.json"
    assert os.path.exists(sidecar), "final checkpoint missing calib sidecar"
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "best_model_unet.calib.json"))
    scales, mtype = qf.load_scales(sidecar)
    assert mtype == "unet" and len(scales) == 20
    assert all(np.all(np.asarray(s) > 0) for s in scales.values())

    # engine auto-discovers the sidecar: int8 from batch 0, no streaming
    # calibration, byte-identical across engine instances
    icfg = InferConfig(model=ModelConfig(model_type="unet"),
                       checkpoint_path=final, quant="int8", bf16=False)
    eng1 = load_engine(icfg)
    assert eng1._quant_fwd is not None     # frozen before any batch
    batch = np.random.default_rng(0).random((2, 32, 32), np.float32)
    out1 = eng1.upscale_batch(batch)
    assert eng1._quant_batches == {"int8": 1, "bf16": 0}
    out2 = load_engine(icfg).upscale_batch(batch)
    np.testing.assert_array_equal(out1, out2)

    # an explicit --quant_calib path still wins over the sidecar
    other = str(tmp_path / "explicit.json")
    qf.save_scales(other, scales, "unet")
    icfg2 = InferConfig(model=ModelConfig(model_type="unet"),
                        checkpoint_path=final, quant="int8", bf16=False,
                        quant_calib_path=other)
    assert load_engine(icfg2)._quant_fwd is not None


def test_qat_resume_restores_running_amax(tmp_path, capsys):
    pytest.importorskip("cv2")
    from mri_superresolution_tpu.train.trainer import train

    hr_dir, lr_dir = _make_dataset(tmp_path, n=8)
    cfg = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=1, qat=True,
                       qat_decay=0.9)
    train(cfg)
    capsys.readouterr()

    cfg2 = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=2, qat=True,
                        qat_decay=0.9)
    cfg2.resume = True
    train(cfg2)
    out = capsys.readouterr().out
    # resumed from a QAT checkpoint: the ranges came from extras, not re-init
    assert "without QAT state" not in out
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "final_model_unet.calib.json"))


def test_qat_finetune_from_bf16_checkpoint(tmp_path, capsys):
    """The standard QAT recipe: fine-tune a converged bf16 checkpoint with
    --qat --resume. The flag flip is detected from the checkpoint's stored
    config: activation ranges re-initialize, and the LR-plateau /
    early-stop histories reset (they were calibrated to the bf16
    validation metric) so best-model saving works under the new metric."""
    pytest.importorskip("cv2")
    from mri_superresolution_tpu.train.trainer import train

    hr_dir, lr_dir = _make_dataset(tmp_path, n=8)
    cfg = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=2)
    train(cfg)
    capsys.readouterr()

    cfg2 = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=4, qat=True,
                        qat_decay=0.9)
    cfg2.resume = True
    train(cfg2)
    out = capsys.readouterr().out
    assert "histories are reset" in out
    assert "re-initialized from one batch through the RESTORED weights" in out
    assert "initializing the running activation ranges" in out
    # early-stop reset -> the first QAT validation becomes the new best,
    # so the fine-tune exports a best checkpoint + sidecar
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "best_model_unet.calib.json"))
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "final_model_unet.calib.json"))


def test_qat_finetune_sidecar_measures_restored_weights(tmp_path):
    """Regression (r3 review): the --qat --resume fine-tune must initialize
    its running activation ranges on the RESTORED checkpoint weights, not
    the random init. A zero-extra-epoch resume (epochs == start_epoch)
    freezes exactly that init calibration into the exported sidecar, which
    must equal a by-hand calibration of the restored weights over the full
    training set (batch_size == n and the statistic is an
    order-invariant max, so the shuffled first batch is reproducible)."""
    pytest.importorskip("cv2")
    from mri_superresolution_tpu.data.dataset import PairedSliceDataset
    from mri_superresolution_tpu.train import checkpoint as ckpt
    from mri_superresolution_tpu.train.trainer import train

    hr_dir, lr_dir = _make_dataset(tmp_path, n=8)
    cfg = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=2,
                       validation_split=0.0)
    final = train(cfg)

    cfg2 = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=2, qat=True,
                        qat_decay=0.9, validation_split=0.0)
    cfg2.resume = True
    train(cfg2)          # start_epoch == epochs: calibrate + re-save only

    scales, _ = qf.load_scales(final[:-len(".ckpt")] + ".calib.json")
    params_r, _, _meta = ckpt.load_checkpoint(final)
    lr_arr, _hr = PairedSliceDataset(str(hr_dir), str(lr_dir)).load_all()
    # reproduce the batch the loader feeds the trainer: NHWC, [0, 1]
    x = jnp.asarray(np.asarray(lr_arr, np.float32)[..., None] / 255.0)
    amax = qf.calib_amax(params_r, x, "unet", jnp.float32)
    want = qf.scales_from_amax(jax.device_get(amax))
    assert set(scales) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(scales[k]),
                                   np.asarray(want[k]), rtol=1e-5,
                                   err_msg=f"site {k}: sidecar scales do "
                                           f"not match the restored-weights "
                                           f"calibration")


def test_qat_composes_with_ema_and_grad_accum(tmp_path, capsys):
    """--qat --ema_decay --grad_accum together: the checkpoint carries BOTH
    extras (raw live weights for resume + QAT running ranges), serves the
    EMA average, and exports a sidecar whose scales are MEASURED ON THE
    SERVED (EMA) WEIGHTS — not the live-forward running statistic, which
    describes a network the checkpoint does not serve (r3 review)."""
    pytest.importorskip("cv2")
    from mri_superresolution_tpu.data.dataset import (BatchLoader,
                                                      PairedSliceDataset,
                                                      train_val_split)
    from mri_superresolution_tpu.train import checkpoint as ckpt
    from mri_superresolution_tpu.train.trainer import train

    hr_dir, lr_dir = _make_dataset(tmp_path, n=8)
    cfg = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=2, qat=True,
                       qat_decay=0.9, ema_decay=0.5, grad_accum=2)
    final = train(cfg)
    capsys.readouterr()
    assert os.path.exists(final)
    sidecar = final[:-len(".ckpt")] + ".calib.json"
    scales, mtype = qf.load_scales(sidecar)
    assert mtype == "unet" and len(scales) == 20
    params_srv, _, _meta, extras = ckpt.load_checkpoint(final,
                                                        return_extras=True)
    assert "raw_params" in extras and "qat_amax" in extras
    assert len(extras["qat_amax"]) == 20

    # by hand: calibrate the checkpoint's SERVING (EMA) params on the
    # trainer's retained calibration batch — the first train batch of
    # epoch 0 (batch_size rounds 8 -> 16 for the 8-way mesh x 2
    # microbatches; loader order is (seed, epoch)-deterministic)
    dataset = PairedSliceDataset(str(hr_dir), str(lr_dir))
    lr_arr, hr_arr = dataset.load_all()
    train_idx, _ = train_val_split(len(dataset), cfg.validation_split,
                                   cfg.seed)
    fb = next(iter(BatchLoader(lr_arr, hr_arr, train_idx, 16,
                               shuffle=True, seed=cfg.seed).epoch(0)))
    amax = qf.calib_amax(params_srv, jnp.asarray(fb["lr"]),
                         "unet", jnp.float32)
    want = qf.scales_from_amax(jax.device_get(amax))
    assert set(scales) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(scales[k]), np.asarray(want[k]), rtol=1e-5,
            err_msg=f"site {k}: sidecar not measured on the EMA weights")

    # Zero-extra-epoch re-save (epochs == start_epoch, the epoch loop
    # never runs): serving_amax is seeded at setup, so the re-exported
    # sidecar must STILL describe the served EMA weights — which did not
    # train, so the scales equal the first run's by-hand calibration
    # (r3 review: the fallback used to export the live-weights running
    # statistic here).
    cfg2 = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=2, qat=True,
                        qat_decay=0.9, ema_decay=0.5, grad_accum=2)
    cfg2.resume = True
    train(cfg2)
    capsys.readouterr()
    scales2, _ = qf.load_scales(sidecar)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(scales2[k]), np.asarray(want[k]), rtol=1e-5,
            err_msg=f"site {k}: zero-epoch re-save exported non-EMA scales")


def test_qat_spatial_step_matches_dense(rng):
    """QAT composes with spatial sharding: one train step through the
    row-sharded fake-quant forward (parallel/spatial.py _QCtx) must match
    the dense fake-quant step — same site set, same recorded batch
    statistic (pmax over both mesh axes == the dense global max), and
    weights within the quantizer-boundary tolerance the grad_accum
    equivalence test established (reassociating GN psums can flip
    sub-noise quantizer codes; a real bug moves essentially every
    element)."""
    from mri_superresolution_tpu.config import LossConfig
    from mri_superresolution_tpu.losses.combined import CombinedLoss
    from mri_superresolution_tpu.parallel import (build_spatial_loss,
                                                  make_spatial_mesh)
    from mri_superresolution_tpu.train.trainer import (
        TrainState, build_spatial_train_step, build_train_step,
        make_optimizer)

    model, params = _model_and_params("unet")
    x = jnp.asarray(rng.random((4, 32, 32, 1), np.float32))
    hr = jnp.asarray(rng.random((4, 64, 64, 1), np.float32))
    amax0 = qf.calib_amax(params, x, "unet", jnp.float32)
    cfg = LossConfig(ssim_weight=0.3)
    batch = {"hr": hr, "lr": x, "weight": jnp.ones((4,), jnp.float32)}
    lr, key = jnp.asarray(1e-3, jnp.float32), jax.random.key(0)

    opt = make_optimizer(0.0)
    fq = qf.build_fakequant_forward("unet", jnp.float32)
    dense_step = jax.jit(build_train_step(
        model, CombinedLoss(cfg), opt, None, cfg, qat_fwd=fq,
        qat_decay=0.9))
    s0 = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                    opt_state=opt.init(params), qat_amax=amax0)
    sd, md = dense_step(s0, batch, lr, key)

    mesh = make_spatial_mesh(2, 2)
    sharded = build_spatial_loss(mesh, (32, 32), cfg, model_type="unet",
                                 dtype=jnp.float32,
                                 qat_sites=sorted(amax0))
    sp_step = jax.jit(build_spatial_train_step(
        sharded, opt, None, qat=True, qat_decay=0.9))
    s0b = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                     opt_state=opt.init(params), qat_amax=amax0)
    ss, ms = sp_step(s0b, batch, lr, key)

    assert abs(float(md["loss"]) - float(ms["loss"])) < 1e-3
    assert abs(float(md["ssim"]) - float(ms["ssim"])) < 1e-3
    assert set(sd.qat_amax) == set(ss.qat_amax)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2),
        sd.qat_amax, ss.qat_amax)
    mismatch = total = 0
    for a, b in zip(jax.tree_util.tree_leaves(sd.params),
                    jax.tree_util.tree_leaves(ss.params)):
        a, b = np.asarray(a), np.asarray(b)
        assert float(np.max(np.abs(a - b))) <= 2.2e-3     # Adam step-1 cap
        mismatch += int((np.abs(a - b) > 5e-5 + 2e-3 * np.abs(b)).sum())
        total += a.size
    assert mismatch / total < 0.15, f"{mismatch}/{total} elements differ"


def test_qat_spatial_foreground_routing_is_global_per_sample(rng):
    """The spatial fakequant's foreground decision must be per GLOBAL
    sample (fractions psum'd over the space axis): a batch of pure
    background records a ZERO statistic with any_fg False — the trainer's
    EMA update is then an exact no-op, matching the dense path."""
    from mri_superresolution_tpu.config import LossConfig
    from mri_superresolution_tpu.parallel import (build_spatial_loss,
                                                  make_spatial_mesh)
    from mri_superresolution_tpu.train.trainer import (
        TrainState, build_spatial_train_step, make_optimizer)

    _, params = _model_and_params("unet")
    x = jnp.asarray(rng.random((4, 32, 32, 1), np.float32))
    amax0 = qf.calib_amax(params, x, "unet", jnp.float32)
    cfg = LossConfig(ssim_weight=0.3)
    mesh = make_spatial_mesh(2, 2)
    sharded = build_spatial_loss(mesh, (32, 32), cfg, model_type="unet",
                                 dtype=jnp.float32,
                                 qat_sites=sorted(amax0))
    opt = make_optimizer(0.0)
    step = jax.jit(build_spatial_train_step(sharded, opt, None, qat=True,
                                            qat_decay=0.9))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt.init(params), qat_amax=amax0)
    bg = {"hr": jnp.zeros((4, 64, 64, 1), jnp.float32),
          "lr": jnp.zeros((4, 32, 32, 1), jnp.float32),
          "weight": jnp.ones((4,), jnp.float32)}
    new_state, metrics = step(state, bg, jnp.asarray(1e-3, jnp.float32),
                              jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        new_state.qat_amax, amax0)


def test_qat_spatial_train_end_to_end(tmp_path, capsys):
    """train --qat --spatial_shards 2 runs end-to-end on the CPU mesh and
    exports the calibration sidecar (the r3 gate is gone)."""
    pytest.importorskip("cv2")
    from mri_superresolution_tpu.train.trainer import train

    hr_dir, lr_dir = _make_dataset(tmp_path, n=8)
    cfg = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=2, qat=True,
                       qat_decay=0.9, spatial_shards=2)
    final = train(cfg)
    out = capsys.readouterr().out
    assert "QAT enabled" in out
    assert "Spatially-sharded training" in out
    assert os.path.exists(final)
    sidecar = final[:-len(".ckpt")] + ".calib.json"
    scales, mtype = qf.load_scales(sidecar)
    assert mtype == "unet" and len(scales) == 20


def test_qat_validation_errors(tmp_path):
    from mri_superresolution_tpu.train.trainer import train

    d = str(tmp_path)

    cfg = _tiny_config(tmp_path, d, d, qat=True, qat_decay=1.5)
    with pytest.raises(ValueError, match="qat_decay"):
        train(cfg)

    # every registered family now has a fake-quant forward, so the gate's
    # remaining job is rejecting model types quant_forward doesn't know
    cfg = _tiny_config(tmp_path, d, d, qat=True)
    cfg.model.model_type = "hourglass"
    with pytest.raises(ValueError, match="int8 serving families"):
        train(cfg)
