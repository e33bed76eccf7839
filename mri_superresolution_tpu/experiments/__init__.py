"""Closed performance experiments — measured, documented, NOT on any hot path.

Every module here is a numerically-exact alternative implementation that was
benchmarked on real TPU hardware and measured SLOWER than the shipped XLA
path (details in CLAUDE.md "Perf state" and RESULTS.md):

- ``ssim_pallas``   — fused Pallas SSIM (the trainer uses ``ops.ssim``).
- ``conv_pallas``   — column-packed Pallas 3x3 conv (~5x slower: Mosaic
  relayouts dominate).
- ``groupnorm_pallas`` — one-pass fused GroupNorm+LeakyReLU (~2x slower than
  XLA's cross-op fusion).
- ``phase``         — space-to-depth phase algebra for the final 2x stage
  (exact, but layout ops lose more than the rescattered convs gain; kept
  because ``models/unet.py`` exposes it behind the opt-in
  ``UNetSuperRes(phase_final=True)``).

They are kept importable (with their tests) as honest negative results and
as starting points should Mosaic codegen change; nothing in the production
model/serving path imports them except the ``phase_final`` opt-in above.
"""
