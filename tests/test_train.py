"""Trainer tests: scheduler parity, optimizer parity vs torch Adam,
end-to-end tiny training over the 8-device CPU mesh, checkpoint/resume."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import (AugmentConfig, LossConfig,
                                            ModelConfig, TrainConfig)
from mri_superresolution_tpu.train.plateau import (EarlyStopping,
                                                   ReduceLROnPlateau)
from mri_superresolution_tpu.train import checkpoint as ckpt
from mri_superresolution_tpu.train.trainer import make_optimizer


# ---------------------------------------------------------------- scheduler

def test_plateau_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    tparam = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.Adam([tparam], lr=1e-3)
    tsch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, mode="min", factor=0.5, patience=2)
    ours = ReduceLROnPlateau(1e-3, factor=0.5, patience=2)
    rng = np.random.default_rng(3)
    metrics = list(rng.random(8)) + [0.01] + list(rng.random(8) * 0.009 + 0.009)
    for m in metrics:
        tsch.step(m)
        ours.step(m)
        assert abs(topt.param_groups[0]["lr"] - ours.lr) < 1e-12, m


def test_early_stopping():
    es = EarlyStopping(patience=3)
    assert es.update(1.0) and not es.should_stop
    assert not es.update(1.1)
    assert not es.update(1.2)
    assert es.update(0.9)          # reset on new best
    assert es.counter == 0
    for v in (1.0, 1.0, 1.0):
        es.update(v)
    assert es.should_stop


# ---------------------------------------------------------------- optimizer

def test_optimizer_matches_torch_adam_l2():
    """Our add_decayed_weights→scale_by_adam chain must track torch Adam with
    weight_decay (L2-in-Adam semantics, scripts/train.py:186)."""
    torch = pytest.importorskip("torch")
    import optax

    w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    lr, wd = 1e-2, 1e-3

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)

    params = {"w": jnp.asarray(w0)}
    opt = make_optimizer(wd)
    opt_state = opt.init(params)

    for step in range(5):
        g = np.random.default_rng(step + 1).normal(size=(4, 3)).astype(np.float32)
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

        grads = {"w": jnp.asarray(g)}
        updates, opt_state = opt.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------- end-to-end

def _make_dataset(tmp_path, n=16, hw=32):
    """Synthetic paired dataset: HR = smooth random fields, LR = 2x AREA
    downsample (learnable mapping)."""
    import cv2
    hr_dir = tmp_path / "hr"
    lr_dir = tmp_path / "lr"
    hr_dir.mkdir()
    lr_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        base = rng.random((hw // 4, hw // 4)).astype(np.float32)
        hr = cv2.resize(base, (hw, hw), interpolation=cv2.INTER_CUBIC)
        hr = np.clip(hr, 0, 1)
        lr = cv2.resize(hr, (hw // 2, hw // 2), interpolation=cv2.INTER_AREA)
        cv2.imwrite(str(hr_dir / f"sub-S{i:02d}_s000.png"),
                    (hr * 255).astype(np.uint8))
        cv2.imwrite(str(lr_dir / f"sub-S{i:02d}_s000.png"),
                    (lr * 255).astype(np.uint8))
    return str(hr_dir), str(lr_dir)


def _tiny_config(tmp_path, hr_dir, lr_dir, **overrides):
    cfg = TrainConfig(
        full_res_dir=hr_dir,
        low_res_dir=lr_dir,
        model=ModelConfig(base_filters=16),
        loss=LossConfig(ssim_weight=0.3),
        augment=AugmentConfig(enabled=False),
        batch_size=8,
        epochs=3,
        learning_rate=2e-3,
        patience=10,
        seed=0,
        bf16=False,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
    )
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def test_train_step_mesh_equivalence():
    """One optimizer step on an 8-device sharded mesh must equal the same
    step on 1 device (same data, same key) — the strongest GSPMD training
    correctness check available without hardware (mirrors the inference
    equivalence test at test_infer.py)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mri_superresolution_tpu.losses import CombinedLoss
    from mri_superresolution_tpu.models import build_model
    from mri_superresolution_tpu.train.trainer import (TrainState,
                                                       build_train_step)

    model = build_model(ModelConfig(base_filters=16), dtype=jnp.float32)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 16, 16, 1)))["params"]
    optimizer = make_optimizer(1e-5)
    loss_fn = CombinedLoss(LossConfig(ssim_weight=0.3))
    step_fn = build_train_step(model, loss_fn, optimizer,
                               AugmentConfig(enabled=True),
                               LossConfig(ssim_weight=0.3))

    rng = np.random.default_rng(7)
    batch = {
        "lr": rng.random((16, 16, 16, 1), dtype=np.float32),
        "hr": rng.random((16, 32, 32, 1), dtype=np.float32),
        "weight": np.ones((16,), np.float32),
    }
    lr_val = jnp.asarray(2e-3, jnp.float32)
    key = jax.random.key(3)

    from mri_superresolution_tpu.ops.augment import augment_pair

    def loss_of(p, data, k):
        hr, lo = augment_pair(data["hr"], data["lr"], k,
                              AugmentConfig(enabled=True))
        out = model.apply({"params": p}, lo)
        total, _ = loss_fn(out, hr, sample_weights=data["weight"])
        return total

    results = {}
    for n_dev in (1, 8):
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
        rsh, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
        state = jax.device_put(
            TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params)), rsh)
        dev_batch = {k: jax.device_put(jnp.asarray(v), dsh)
                     for k, v in batch.items()}
        jitted = jax.jit(step_fn, in_shardings=(rsh, dsh, None, None),
                         out_shardings=(rsh, rsh))
        new_state, metrics = jitted(state, dev_batch, lr_val, key)
        grads = jax.jit(jax.grad(loss_of),
                        in_shardings=(rsh, dsh, None))(
            jax.device_put(params, rsh), dev_batch, key)
        results[n_dev] = (jax.device_get(new_state.params),
                          float(metrics["loss"]), jax.device_get(grads))

    p1, loss1, g1 = results[1]
    p8, loss8, g8 = results[8]
    # The sharded loss and the data-parallel mean gradient must match the
    # single-device run closely — this is the real GSPMD correctness check.
    # fp32 reduction order differs between mesh sizes (per-device partial
    # means + psum vs one flat mean), observed up to ~0.8% relative on small
    # gradient elements; a wrong psum/mean would be off by O(n_devices)=8x.
    np.testing.assert_allclose(loss1, loss8, rtol=1e-5)
    gflat8 = dict(jax.tree_util.tree_leaves_with_path(g8))
    for path, v1 in jax.tree_util.tree_leaves_with_path(g1):
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(gflat8[path]), rtol=1e-2, atol=5e-5,
            err_msg="grad " + jax.tree_util.keystr(path))
    # Post-Adam params: where a gradient element is ~0, fp32 reduction-order
    # noise can flip its sign and Adam's m/sqrt(v) turns that into a full
    # +-lr update — so isolated elements may differ by up to ~2*lr. Require
    # near-total agreement plus that bound (a real bug shifts whole tensors).
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(p8))
    assert flat1
    lr_f = float(lr_val)
    for path, v1 in flat1:
        diff = np.abs(np.asarray(v1) - np.asarray(flat8[path]))
        frac_off = float(np.mean(diff > 1e-4))
        assert frac_off < 2e-3, (jax.tree_util.keystr(path), frac_off)
        assert float(diff.max()) <= 2.5 * lr_f, (
            jax.tree_util.keystr(path), float(diff.max()))


def test_remat_gradients_identical():
    """--remat (jax.checkpoint) must change memory behavior only: the
    recomputed backward evaluates the same ops, so losses and gradients
    match the plain step to float tolerance."""
    from mri_superresolution_tpu.losses import CombinedLoss
    from mri_superresolution_tpu.models import build_model
    from mri_superresolution_tpu.train.trainer import (TrainState,
                                                       build_train_step)

    base = build_model(ModelConfig(base_filters=16), dtype=jnp.float32)
    params = base.init(jax.random.key(0),
                       jnp.zeros((1, 16, 16, 1)))["params"]
    optimizer = make_optimizer(1e-5)
    cfg = LossConfig(ssim_weight=0.3)
    rng = np.random.default_rng(11)
    batch = {"lr": jnp.asarray(rng.random((8, 16, 16, 1), np.float32)),
             "hr": jnp.asarray(rng.random((8, 32, 32, 1), np.float32)),
             "weight": jnp.ones((8,), jnp.float32)}
    lr_val = jnp.asarray(1e-4, jnp.float32)
    key = jax.random.key(3)

    def run(remat):
        # remat model consumes the SAME param tree (lifted transform);
        # remat also checkpoints the loss graph inside build_train_step
        model = build_model(ModelConfig(base_filters=16),
                            dtype=jnp.float32, remat=remat)
        step = jax.jit(build_train_step(model, CombinedLoss(cfg), optimizer,
                                        AugmentConfig(enabled=True), cfg,
                                        remat=remat))
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=optimizer.init(params))
        return step(state, batch, lr_val, key)

    (s0, m0), (s1, m1) = run(False), run(True)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    from jax.flatten_util import ravel_pytree
    f0, _ = ravel_pytree(s0.params)
    f1, _ = ravel_pytree(s1.params)
    # not bitwise: XLA fuses the recomputed forward differently, and Adam's
    # step-1 normalization amplifies ulp-level grad diffs on ~1e-5 of params
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-5, atol=1e-5)


def test_grad_accum_exact_equivalence():
    """--grad_accum must change memory behavior only: every loss term is a
    weighted mean, so microbatch gradients scaled by their weight-sums and
    divided by the global weight-sum recombine to the full-batch gradient.
    One optimizer step with accum=4 must match accum=1 on the same batch —
    including augmentation (applied before the split) and zero-weight
    padded samples."""
    from mri_superresolution_tpu.losses import CombinedLoss
    from mri_superresolution_tpu.models import build_model
    from mri_superresolution_tpu.train.trainer import (TrainState,
                                                       build_train_step)

    model = build_model(ModelConfig(base_filters=16), dtype=jnp.float32)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 16, 16, 1)))["params"]
    optimizer = make_optimizer(1e-5)
    cfg = LossConfig(ssim_weight=0.3)
    rng = np.random.default_rng(13)
    w = np.ones((16,), np.float32)
    w[13:] = 0.0                      # padded tail (masked samples)
    w[:4] = 2.0                       # nonuniform real weights
    batch = {"lr": jnp.asarray(rng.random((16, 16, 16, 1), np.float32)),
             "hr": jnp.asarray(rng.random((16, 32, 32, 1), np.float32)),
             "weight": jnp.asarray(w)}
    lr_val = jnp.asarray(1e-3, jnp.float32)
    key = jax.random.key(5)

    def run(accum):
        step = jax.jit(build_train_step(model, CombinedLoss(cfg), optimizer,
                                        AugmentConfig(enabled=True), cfg,
                                        grad_accum=accum))
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=optimizer.init(params))
        return step(state, batch, lr_val, key)

    (s1, m1), (s4, m4) = run(1), run(4)
    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m4["ssim"]), float(m1["ssim"]),
                               rtol=1e-6)
    from jax.flatten_util import ravel_pytree
    f1, _ = ravel_pytree(s1.params)
    f4, _ = ravel_pytree(s4.params)
    # not bitwise: the scan reassociates the fp32 batch reductions; where a
    # gradient element is ~0 that can flip its sign and Adam's step-1
    # m/sqrt(v) turns the flip into a full +-lr update (same bound as
    # test_train_step_mesh_equivalence: isolated elements only)
    diff = np.abs(np.asarray(f4) - np.asarray(f1))
    assert float(np.mean(diff > 1e-5)) < 2e-4, float(np.mean(diff > 1e-5))
    assert float(diff.max()) <= 2.5 * float(lr_val), float(diff.max())


def test_grad_accum_ssim_clip_saturation_counter():
    """The accumulation scan counts microbatches whose reported SSIM metric
    saturates the clip boundary ([<=0] or [>=1]) — the one place the
    accumulated gradient can deviate from the exact full-batch one — while
    all-padding (zero-weight) microbatches must NOT count."""
    from mri_superresolution_tpu.train.trainer import (TrainState,
                                                       _make_train_step)

    def compute_loss(p, _qat_amax, hr, lo, w):
        # stand-in loss whose "ssim_metric" is directly controlled by hr:
        # the per-micro weighted mean of each sample's mean value
        per = jnp.mean(hr, axis=(1, 2, 3))
        m = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-12)
        loss = jnp.mean(lo) * jnp.sum(p["w"])
        return loss, {"ssim_metric": m}

    opt = make_optimizer(0.0)
    step = jax.jit(_make_train_step(compute_loss, opt, None, grad_accum=4))
    params = {"w": jnp.zeros((2,), jnp.float32)}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt.init(params))
    # 4 microbatches of 2 samples: means 1.0 (saturates >=1), 0.5 (fine),
    # -0.2 (saturates <=0), 9.0 but zero-weighted (den=0 -> must not count)
    vals = np.repeat(np.array([1.0, 0.5, -0.2, 9.0], np.float32), 2)
    hr = np.broadcast_to(vals[:, None, None, None], (8, 2, 2, 1))
    batch = {"hr": jnp.asarray(hr),
             "lr": jnp.asarray(np.zeros((8, 1, 1, 1), np.float32)),
             "weight": jnp.asarray(
                 np.array([1, 1, 1, 1, 1, 1, 0, 0], np.float32))}
    _, metrics = step(state, batch, jnp.asarray(1e-4, jnp.float32),
                      jax.random.key(0))
    assert float(metrics["ssim_clip_micros"]) == 2.0


def test_grad_accum_reduces_compiled_temp_memory():
    """grad_accum=4 must plan ~1/4 the activation temp memory (XLA
    memory_analysis): the scan keeps one microbatch's tape live at a time.
    Unlike flax remat (whose dense-path savings only show under the TPU
    scheduler), this is structural and reproduces on CPU."""
    from mri_superresolution_tpu.losses import CombinedLoss
    from mri_superresolution_tpu.models import build_model
    from mri_superresolution_tpu.train.trainer import (TrainState,
                                                       build_train_step)

    model = build_model(ModelConfig(base_filters=32), dtype=jnp.float32)
    params = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 16, 16, 1)))["params"],
        jax.random.key(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    opt = make_optimizer(1e-5)
    cfg = LossConfig(ssim_weight=0.3)
    B, H = 32, 64
    temps = {}
    for accum in (1, 4):
        step = build_train_step(model, CombinedLoss(cfg), opt,
                                AugmentConfig(enabled=False), cfg,
                                grad_accum=accum)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=opt.init(params))
        compiled = jax.jit(step).lower(
            state,
            {"lr": jax.ShapeDtypeStruct((B, H, H, 1), jnp.float32),
             "hr": jax.ShapeDtypeStruct((B, 2 * H, 2 * H, 1), jnp.float32),
             "weight": jax.ShapeDtypeStruct((B,), jnp.float32)},
            jax.ShapeDtypeStruct((), jnp.float32), jax.random.key(1)
        ).compile()
        temps[accum] = compiled.memory_analysis().temp_size_in_bytes
    # measured 706 -> 171 MB (4.1x); assert half to absorb scheduler drift
    assert temps[4] < 0.5 * temps[1], temps


def test_remat_reduces_compiled_temp_memory():
    """remat must actually shrink the executable's planned temp memory
    (XLA memory_analysis), guarding against the segmentation degenerating
    back into one whole-forward checkpoint (a measured no-op). Asserted on
    the spatial path, whose savings reproduce on the CPU backend (the
    flax dense path's -32% only materializes under the TPU scheduler —
    both measured in tools/bench_remat_mem.py)."""
    from mri_superresolution_tpu.parallel import (build_spatial_loss,
                                                  make_spatial_mesh)

    cfg = LossConfig(ssim_weight=0.3)
    mesh = make_spatial_mesh(1, 2)
    temps = {}
    for remat in (False, True):
        sl = build_spatial_loss(mesh, (128, 128), cfg, "unet",
                                jnp.float32, remat=remat)
        from mri_superresolution_tpu.models import build_model
        model = build_model(ModelConfig(base_filters=32), dtype=jnp.float32)
        params = jax.eval_shape(
            lambda r: model.init(r, jnp.zeros((1, 16, 16, 1)))["params"],
            jax.random.key(0))
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), params)
        grad_fn = jax.jit(jax.grad(lambda p, hr, lo, w:
                                   sl(p, hr, lo, w)[0]))
        compiled = grad_fn.lower(
            params,
            jax.ShapeDtypeStruct((4, 256, 256, 1), jnp.float32),
            jax.ShapeDtypeStruct((4, 128, 128, 1), jnp.float32),
            jax.ShapeDtypeStruct((4,), jnp.float32)).compile()
        temps[remat] = compiled.memory_analysis().temp_size_in_bytes
    assert temps[True] < 0.9 * temps[False], temps


def test_train_end_to_end_8dev_mesh(tmp_path, capsys):
    """Full training over the virtual 8-device mesh: loss decreases,
    checkpoints + protocol messages written."""
    pytest.importorskip("cv2")
    from mri_superresolution_tpu.train.trainer import train

    hr_dir, lr_dir = _make_dataset(tmp_path)
    cfg = _tiny_config(tmp_path, hr_dir, lr_dir)
    assert jax.device_count() == 8

    final = train(cfg)
    assert os.path.exists(final)
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "best_model_unet.ckpt"))

    out = capsys.readouterr().out
    lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    kinds = {l["type"] for l in lines}
    assert {"params", "batch_update", "epoch_summary"} <= kinds
    summaries = [l for l in lines if l["type"] == "epoch_summary"]
    assert len(summaries) == 3
    # training made progress
    assert summaries[-1]["train_loss"] < summaries[0]["train_loss"]
    # hyperparams stored in the checkpoint sidecar (fixes reference gap)
    meta = json.load(open(os.path.join(cfg.checkpoint_dir,
                                       "final_model_unet.json")))
    assert meta["config"]["model"]["base_filters"] == 16
    assert "val_loss" in meta


def test_train_resume(tmp_path, capsys):
    pytest.importorskip("cv2")
    from mri_superresolution_tpu.train.trainer import train

    hr_dir, lr_dir = _make_dataset(tmp_path, n=8)
    cfg = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=2)
    train(cfg)
    capsys.readouterr()

    cfg2 = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=4)
    cfg2.resume = True
    train(cfg2)
    out = capsys.readouterr().out
    lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    summaries = [l for l in lines if l["type"] == "epoch_summary"]
    # resumed at epoch 2 → epochs 2 and 3 only
    assert [s["epoch"] for s in summaries] == [2, 3]


def test_step_granular_kill_and_resume(tmp_path, capsys):
    """Preemption mid-epoch with --save_every_steps must resume
    BIT-IDENTICALLY (SURVEY §5 'deterministic data order for restart',
    VERDICT r3 item 4): run B is killed inside epoch 1, resumes from the
    step checkpoint's batch cursor, and its final weights equal run A's
    uninterrupted ones exactly — loader order is (seed, epoch)-
    deterministic and augmentation keys fold (epoch, batch), so the
    continuation replays the identical arithmetic."""
    pytest.importorskip("cv2")
    from mri_superresolution_tpu.config import AugmentConfig
    from mri_superresolution_tpu.train.trainer import train

    hr_dir, lr_dir = _make_dataset(tmp_path, n=32)
    # augmentation ON: the strictest determinism check (per-batch RNG).
    # batch 8 on the 8-device mesh -> 4 batches/epoch; save_every_steps=3
    # puts the step checkpoint strictly INSIDE epoch 0 (cursor 3 of 4).
    mk = lambda d, **kw: _tiny_config(
        tmp_path, hr_dir, lr_dir, epochs=3, batch_size=8,
        augment=AugmentConfig(enabled=True), checkpoint_dir=str(d),
        save_every_steps=3, **kw)

    a_dir, b_dir = tmp_path / "ckpt_a", tmp_path / "ckpt_b"
    final_a = train(mk(a_dir))
    capsys.readouterr()

    boom = RuntimeError("simulated preemption")

    def cb(epoch, batch_idx, loss):
        if epoch == 1:
            raise boom

    with pytest.raises(RuntimeError, match="simulated preemption"):
        train(mk(b_dir), progress_cb=cb)
    capsys.readouterr()
    step_meta = json.load(open(os.path.join(str(b_dir),
                                            "step_model_unet.json")))
    assert step_meta["batch_cursor"] > 0          # a MID-epoch checkpoint

    final_b = train(mk(b_dir, resume=True))
    out = capsys.readouterr().out
    assert "mid-epoch" in out                     # resumed inside epoch 1

    pa, _, _ = ckpt.load_checkpoint(final_a)
    pb, _, _ = ckpt.load_checkpoint(final_b)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        pa, pb)

    # a COMPLETED run deletes its step checkpoint (r4 review: a stale one
    # would hijack a later fresh run's --resume via its larger step count)
    for d in (a_dir, b_dir):
        assert not os.path.exists(os.path.join(str(d),
                                               "step_model_unet.ckpt"))


def test_checkpoint_roundtrip(tmp_path):
    params = {"layer": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    opt = make_optimizer(1e-5)
    opt_state = opt.init(params)
    path = str(tmp_path / "best_model_unet")
    ckpt.save_checkpoint(path, params, opt_state, meta={"epoch": 7})
    p2, o2, meta = ckpt.load_checkpoint(path + ".ckpt",
                                        opt_state_template=opt_state)
    np.testing.assert_array_equal(p2["layer"]["kernel"],
                                  params["layer"]["kernel"])
    assert meta["epoch"] == 7
    assert jax.tree_util.tree_structure(o2) == \
        jax.tree_util.tree_structure(opt_state)


def test_checkpoint_discovery_precedence(tmp_path):
    d = str(tmp_path)
    with pytest.raises(FileNotFoundError):
        ckpt.find_best_checkpoint(d, "unet")
    open(os.path.join(d, "other_unet_run.ckpt"), "wb").write(b"")
    assert ckpt.find_best_checkpoint(d, "unet").endswith("other_unet_run.ckpt")
    open(os.path.join(d, "final_model_unet.ckpt"), "wb").write(b"")
    assert ckpt.find_best_checkpoint(d, "unet").endswith("final_model_unet.ckpt")
    open(os.path.join(d, "best_model_unet.ckpt"), "wb").write(b"")
    assert ckpt.find_best_checkpoint(d, "unet").endswith("best_model_unet.ckpt")


def test_resolve_checkpoint_explicit_path_wins(tmp_path):
    """resolve_checkpoint (shared by load_engine and the artifact export
    CLI) must prefer an explicit existing path over discovery — so e.g.
    an int8 export's default calibration sidecar is derived from the
    checkpoint actually being exported, never a different one."""
    d = str(tmp_path)
    explicit = os.path.join(d, "final_model_unet.ckpt")
    open(os.path.join(d, "best_model_unet.ckpt"), "wb").write(b"")
    open(explicit, "wb").write(b"")
    assert ckpt.resolve_checkpoint(d, "unet", explicit) == explicit
    # missing explicit path falls back to discovery
    assert ckpt.resolve_checkpoint(d, "unet", os.path.join(d, "nope.ckpt")
                                   ).endswith("best_model_unet.ckpt")
    assert ckpt.resolve_checkpoint(d, "unet").endswith("best_model_unet.ckpt")
    assert ckpt.calib_sidecar_path(explicit) == explicit[:-5] + ".calib.json"


def test_training_is_deterministic(tmp_path, capsys):
    """Two identical runs must produce identical losses (donated buffers,
    counter-based RNG, epoch-derived data order)."""
    pytest.importorskip("cv2")
    import json as _json
    from mri_superresolution_tpu.train.trainer import train
    from mri_superresolution_tpu.config import AugmentConfig

    hr_dir, lr_dir = _make_dataset(tmp_path, n=8)

    def run(tag):
        cfg = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=2)
        cfg.checkpoint_dir = str(tmp_path / f"ckpt_{tag}")
        cfg.log_dir = str(tmp_path / f"logs_{tag}")
        cfg.augment = AugmentConfig(enabled=True)
        train(cfg)
        out = capsys.readouterr().out
        return [_json.loads(l)["train_loss"] for l in out.splitlines()
                if l.startswith("{") and "epoch_summary" in l]

    a = run("a")
    b = run("b")
    assert a == b, (a, b)


def test_zero1_sharding_rules():
    """zero1_shardings shards each leaf's largest mesh-divisible axis and
    replicates scalars/indivisible leaves."""
    from jax.sharding import Mesh, PartitionSpec as P
    from mri_superresolution_tpu.parallel import zero1_shardings

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    tree = {"kernel": np.zeros((3, 3, 16, 32)), "bias": np.zeros((32,)),
            "odd": np.zeros((7, 5)), "count": np.zeros(())}
    sh = zero1_shardings(tree, mesh)
    assert sh["kernel"].spec == P(None, None, None, "data")
    assert sh["bias"].spec == P("data")
    assert sh["odd"].spec == P()
    assert sh["count"].spec == P()


def test_opt_shard_zero1_equivalence_and_placement():
    """--opt_shard must change optimizer-state PLACEMENT only: one step on
    the 8-device mesh with ZeRO-1-sharded moments matches the replicated
    run, and the sharded moment tensors genuinely hold 1/8 per device."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mri_superresolution_tpu.losses import CombinedLoss
    from mri_superresolution_tpu.models import build_model
    from mri_superresolution_tpu.parallel import zero1_shardings
    from mri_superresolution_tpu.train.trainer import (TrainState,
                                                       build_train_step)

    model = build_model(ModelConfig(base_filters=16), dtype=jnp.float32)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 16, 16, 1)))["params"]
    optimizer = make_optimizer(1e-5)
    cfg = LossConfig(ssim_weight=0.3)
    step_fn = build_train_step(model, CombinedLoss(cfg), optimizer,
                               AugmentConfig(enabled=False), cfg,
                               ema_decay=0.9)
    rng = np.random.default_rng(17)
    batch = {"lr": rng.random((16, 16, 16, 1), dtype=np.float32),
             "hr": rng.random((16, 32, 32, 1), dtype=np.float32),
             "weight": np.ones((16,), np.float32)}
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    rsh, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
    opt_state = optimizer.init(params)

    def run(opt_shard):
        if opt_shard:
            full = lambda t: jax.tree_util.tree_map(lambda _: rsh, t)
            state_sh = TrainState(step=rsh, params=full(params),
                                  opt_state=zero1_shardings(opt_state, mesh),
                                  ema_params=full(params))
        else:
            state_sh = rsh
        state = jax.device_put(
            TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state,
                       ema_params=jax.tree_util.tree_map(jnp.array, params)),
            state_sh)
        dev_batch = {k: jax.device_put(jnp.asarray(v), dsh)
                     for k, v in batch.items()}
        jitted = jax.jit(step_fn, in_shardings=(state_sh, dsh, None, None),
                         out_shardings=(state_sh, rsh))
        return jitted(state, dev_batch, jnp.asarray(1e-3, jnp.float32),
                      jax.random.key(3))

    (s_rep, m_rep), (s_sh, m_sh) = run(False), run(True)
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_rep["loss"]),
                               rtol=1e-6)
    flat_rep = dict(jax.tree_util.tree_leaves_with_path(s_rep.params))
    for path, v in jax.tree_util.tree_leaves_with_path(s_sh.params):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_rep[path]), rtol=1e-5, atol=1e-6,
            err_msg="param " + jax.tree_util.keystr(path))
    # placement: sharded moment leaves hold 1/8 of the data per device
    sharded = [l for l in jax.tree_util.tree_leaves(s_sh.opt_state)
               if hasattr(l, "sharding") and l.ndim > 0
               and not l.sharding.is_fully_replicated]
    assert sharded, "no optimizer leaf ended up sharded"
    for leaf in sharded:
        assert leaf.addressable_shards[0].data.size == leaf.size // 8
    # EMA tree stays replicated (serving reads it whole)
    for leaf in jax.tree_util.tree_leaves(s_sh.ema_params):
        assert leaf.sharding.is_fully_replicated


def test_ema_matches_explicit_recompute():
    """ema_params must track exactly ema_{t} = d*ema_{t-1} + (1-d)*params_t
    (initialized to params_0), recomputed on the host from the per-step
    param trajectory."""
    from mri_superresolution_tpu.losses import CombinedLoss
    from mri_superresolution_tpu.models import build_model
    from mri_superresolution_tpu.train.trainer import (TrainState,
                                                       build_train_step)

    decay = 0.75
    model = build_model(ModelConfig(base_filters=16), dtype=jnp.float32)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 16, 16, 1)))["params"]
    optimizer = make_optimizer(1e-5)
    cfg = LossConfig(ssim_weight=0.3)
    step = jax.jit(build_train_step(model, CombinedLoss(cfg), optimizer,
                                    AugmentConfig(enabled=False), cfg,
                                    ema_decay=decay))
    rng = np.random.default_rng(21)
    batch = {"lr": jnp.asarray(rng.random((8, 16, 16, 1), np.float32)),
             "hr": jnp.asarray(rng.random((8, 32, 32, 1), np.float32)),
             "weight": jnp.ones((8,), jnp.float32)}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params), ema_params=params)

    expected = jax.device_get(params)   # ema_0 = params_0
    for t in range(3):
        state, _ = step(state, batch, jnp.asarray(1e-3, jnp.float32),
                        jax.random.key(t))
        p_t = jax.device_get(state.params)
        expected = jax.tree_util.tree_map(
            lambda e, p: e * decay + p * (1.0 - decay), expected, p_t)

    for path, got in jax.tree_util.tree_leaves_with_path(
            jax.device_get(state.ema_params)):
        want = dict(jax.tree_util.tree_leaves_with_path(expected))[path]
        np.testing.assert_allclose(
            got, want, rtol=1e-6, atol=1e-7,
            err_msg="ema " + jax.tree_util.keystr(path))


def test_ema_checkpoint_serves_average_and_resumes(tmp_path, capsys):
    """With --ema_decay the checkpoint's 'params' (what inference loads)
    must be the EMA weights, the live weights must ride along under
    'raw_params', and --resume must restore both and keep training."""
    pytest.importorskip("cv2")
    from mri_superresolution_tpu.train.trainer import train

    hr_dir, lr_dir = _make_dataset(tmp_path, n=8)
    cfg = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=2, ema_decay=0.9)
    train(cfg)
    capsys.readouterr()

    path = os.path.join(cfg.checkpoint_dir, "final_model_unet")
    p_ema, _, meta, extras = ckpt.load_checkpoint(path, return_extras=True)
    assert "raw_params" in extras
    assert meta["config"]["ema_decay"] == 0.9
    from jax.flatten_util import ravel_pytree
    f_ema, _ = ravel_pytree(p_ema)
    f_raw, _ = ravel_pytree(extras["raw_params"])
    # the average genuinely lags the live weights after real updates
    assert float(np.abs(np.asarray(f_ema) - np.asarray(f_raw)).max()) > 1e-6

    cfg2 = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=4, ema_decay=0.9)
    cfg2.resume = True
    train(cfg2)
    out = capsys.readouterr().out
    summaries = [json.loads(l) for l in out.splitlines()
                 if l.startswith("{") and "epoch_summary" in l]
    assert [s["epoch"] for s in summaries] == [2, 3]


def test_ema_off_checkpoint_has_no_extras(tmp_path):
    params = {"w": np.ones((2,), np.float32)}
    opt = make_optimizer(0.0)
    path = str(tmp_path / "final_model_unet")
    ckpt.save_checkpoint(path, params, opt.init(params), meta={})
    _, _, _, extras = ckpt.load_checkpoint(path, return_extras=True)
    assert extras == {}


def test_checkpoint_discovery_does_not_cross_model_families(tmp_path):
    d = str(tmp_path)
    open(os.path.join(d, "best_model_unet_tpu.ckpt"), "wb").write(b"")
    with pytest.raises(FileNotFoundError):
        ckpt.find_best_checkpoint(d, "unet")
    assert ckpt.find_best_checkpoint(d, "unet_tpu").endswith(
        "best_model_unet_tpu.ckpt")
