"""b=1 serving experiment (VERDICT r4 item 9): the heads STAGE-2 conv.

The r05 per-refresh profile (devtools/profile_refresh.py) relocated the
KITTI b=1 cost: not the GRU refreshes (~568 us each, 6.2 ms of 36.6) but
the one-time heads block (12.4 ms), half of it the stage-2 conv — 3x3,
256 -> total (10 ch at fork default) at FULL 240x1216 resolution,
measured 5.39 ms vs a ~0.4 ms MXU roofline: 10 output channels fill 10
of 128 MXU lanes.

Candidate fix, the tap-major decomposition models/nlspn.py:409 already
measured and REJECTED for the b=12 train step: one 1x1 conv to 9*total
channels (90 lanes, ~70% MXU fill) + 9 shifted planar adds. At b=12 the
direct conv is MXU-efficient and the intermediate's HBM traffic loses;
at b=1 the direct conv is the 13x-inefficient site — re-measure here.

    PYTHONPATH=/root/repo:/root/.axon_site python devtools/exp_heads_stage2_b1.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nlspn_eccv20_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from bench import measure  # noqa: E402

h, w, cin, cout = 240, 1216, 256, 10
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, h, w, cin)), jnp.float32)
k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)
b = jnp.asarray(rng.standard_normal((cout,)) * 0.05, jnp.float32)


def direct(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def tap_major(x, k, b):
    # one 1x1 conv to 9*cout channels (tap-major), then 9 shifted adds in
    # PLANAR layout (an NHWC 10-ch add would pad 12.8x in the lane dim)
    km = jnp.transpose(k, (0, 1, 2, 3)).reshape(9, cin, cout)
    kflat = jnp.moveaxis(km, 0, 1).reshape(cin, 9 * cout)  # (cin, tap*cout)
    y = jnp.einsum("bhwc,cd->bhwd", x, kflat,
                   preferred_element_type=jnp.float32)
    yp = jnp.moveaxis(y, -1, 1).reshape(1, 9, cout, h, w)
    yp = jnp.pad(yp, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))
    acc = jnp.zeros((1, cout, h, w), jnp.float32)
    t = 0
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            acc = acc + yp[:, t, :, dy:dy + h, dx:dx + w]
            t += 1
    return jnp.moveaxis(acc, 1, -1) + b


fd = jax.jit(direct)
ft = jax.jit(tap_major)
yd = fd(x, k, b)
yt = ft(x, k, b)
err = float(jnp.max(jnp.abs(yd - yt)))
print(f"max abs diff {err:.3e} (scale {float(jnp.max(jnp.abs(yd))):.3e})",
      flush=True)

dt_d = measure(fd, x, k, b)
dt_t = measure(ft, x, k, b)
print(f"direct 3x3 conv 256->{cout} @ {h}x{w} b=1: {dt_d*1e6:8.0f} us")
print(f"tap-major 1x1({9*cout}ch) + planar shifts:  {dt_t*1e6:8.0f} us "
      f"({dt_d/dt_t:.2f}x)")

# and the other big site for context: dec1_conv 128 -> 192
cin2, cout2 = 128, 192
x2 = jnp.asarray(rng.standard_normal((1, h, w, cin2)), jnp.float32)
k2 = jnp.asarray(rng.standard_normal((3, 3, cin2, cout2)) * 0.05, jnp.float32)
b2 = jnp.asarray(rng.standard_normal((cout2,)) * 0.05, jnp.float32)
fd2 = jax.jit(direct)
dt2 = measure(fd2, x2, k2, b2)
flops = 2 * 9 * cin2 * cout2 * h * w
print(f"dec1_conv-shape direct {cin2}->{cout2}: {dt2*1e6:8.0f} us "
      f"({flops/dt2/1e12:.1f} TFLOP/s)")
