"""On-chip smoke gate: compile + run every Pallas kernel variant and the
flagship serving graphs on the REAL TPU chip.

THE RULE (CLAUDE.md): no kernel change lands without a journaled run of
this script on the chip. pytest forces CPU (tests/conftest.py) and
interpret mode evaluates primitives Mosaic cannot lower — round 3 shipped
a gate kernel whose exact-GELU lowered through `erfc` (no Mosaic rule)
with green CPU tests and a dead TPU build (BENCH_r03.json rc=1). This
script is the hardware check that closes that gap.

Usage:
  python scripts/tpu_smoke.py              # all stages, subprocess each
  python scripts/tpu_smoke.py matmul conv  # selected stages, in-process

Stages (each compiles AND executes, asserting finite outputs + parity):
  matmul : all 6 fused_matmul variants — plain, LN+residual, shared-LN
           qkv, 2-output kv, packed-gate GEGLU, two-weight gate
  conv   : fused_gn_silu_conv3x3 (b1 + folded batch), stride-2
           downsample, upsample+skip-fusion, flash attention fwd+bwd
  entry  : __graft_entry__.entry() — the full 512^2 serving graph
  odd    : ServingEngine at 840x560 (the bird.png x8-crop shape)

Stages run as separate subprocesses by default: the remote compile tunnel
occasionally 500s, and a crash in one stage must not hide results from
the rest (same reasoning as bench.py's fallback ladder).
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

STAGES = ("matmul", "conv", "entry", "odd")


def _setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    assert dev.platform == "tpu", (
        f"tpu_smoke must run on the chip, got {dev} — this script exists "
        "precisely because CPU/interpret green is not evidence")
    return jax


def stage_matmul():
    import numpy as np
    import jax.numpy as jnp
    from img2img_turbo_tpu.ops import fused_matmul as fm

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    def t(*s, scale=0.5):
        return jnp.asarray(rng.randn(*s) * scale, dt)

    def check(name, out, ref, atol):
        assert out is not None, f"{name}: plan failed on chip shapes"
        for o, r in zip(out, ref):
            o = np.float32(np.asarray(o)).reshape(r.shape)
            r = np.float32(np.asarray(r))
            assert np.isfinite(o).all(), f"{name}: non-finite"
            np.testing.assert_allclose(o, r, atol=atol, err_msg=name)
        print(f"  matmul/{name} OK")

    # plain matmul (proj_in/out shape)
    x, w, b = t(1, 256, 320), t(320, 320, scale=0.05), t(320, scale=0.1)
    check("plain", fm.fused(x, (w,), (b,)),
          fm._ref(x.reshape(-1, 320), (w,), (b,), None, None, False,
                  False, 1e-5), 0.2)
    # LN + matmul + residual (to_out / ff-out shape)
    s_, sb = t(320, scale=0.1) + 1, t(320, scale=0.1)
    res = t(1, 256, 640)
    w2, b2 = t(320, 640, scale=0.05), t(640, scale=0.1)
    check("ln_residual",
          fm.fused(x, (w2,), (b2,), ln=(s_, sb), residual=res),
          fm._ref(x.reshape(-1, 320), (w2,), (b2,), (s_, sb),
                  res.reshape(-1, 640), False, False, 1e-5), 0.2)
    # shared-LN 3-output self qkv
    ws3 = tuple(t(320, 320, scale=0.05) for _ in range(3))
    z = jnp.zeros(320)
    check("qkv", fm.fused(x, ws3, (z, z, z), ln=(s_, sb)),
          fm._ref(x.reshape(-1, 320), ws3, (z, z, z), (s_, sb), None,
                  False, False, 1e-5), 0.2)
    # 2-output cross kv
    ctx = t(1, 77, 1024)
    wskv = (t(1024, 320, scale=0.05), t(1024, 320, scale=0.05))
    check("kv", fm.fused(ctx, wskv, (z, z)),
          fm._ref(ctx.reshape(-1, 1024), wskv, (z, z), None, None,
                  False, False, 1e-5), 0.4)
    # packed-gate GEGLU — the round-3 erfc killer, now polynomial erf
    wp, bp = t(320, 2560, scale=0.05), t(2560, scale=0.1)
    check("geglu_packed", fm.fused(x, (wp,), (bp,), ln=(s_, sb), gate=True),
          fm._ref(x.reshape(-1, 320), (wp,), (bp,), (s_, sb), None, True,
                  True, 1e-5), 0.2)
    # two-weight gate
    wg = (t(320, 512, scale=0.05), t(320, 512, scale=0.05))
    bg = (t(512, scale=0.1), t(512, scale=0.1))
    check("geglu_two_w", fm.fused(x, wg, bg, gate=True),
          fm._ref(x.reshape(-1, 320), wg, bg, None, None, True,
                  False, 1e-5), 0.2)


def stage_conv():
    import jax
    import numpy as np
    import jax.numpy as jnp
    from img2img_turbo_tpu.ops import attention as attn
    from img2img_turbo_tpu.ops import fused_conv as fc

    rng = np.random.RandomState(1)
    dt = jnp.bfloat16

    def t(*s, scale=0.5):
        return jnp.asarray(rng.randn(*s) * scale, dt)

    def ok(name, *arrs):
        for a in arrs:
            assert np.isfinite(np.float32(np.asarray(a))).all(), name
        print(f"  conv/{name} OK")

    w, b = t(3, 3, 128, 128, scale=0.05), t(128, scale=0.1)
    a_ = jnp.ones((1, 128), jnp.float32)
    b_ = jnp.zeros((1, 128), jnp.float32)
    # GN+SiLU+conv, batch 1 and folded batch
    x1 = t(1, 64, 64, 128)
    y1 = fc.fused_gn_silu_conv3x3(x1, w, b, a=a_, b=b_)
    ok("gn_silu_conv_b1", y1[0])
    x4 = t(4, 32, 32, 128)
    a4 = jnp.ones((4, 128), jnp.float32)
    b4 = jnp.zeros((4, 128), jnp.float32)
    y4 = fc.fused_gn_silu_conv3x3(x4, w, b, a=a4, b=b4)
    ok("gn_silu_conv_folded_b4", y4[0])
    # folded batch with fold_m < B (and < 8): the Mosaic block rule only
    # allows such a sublane block via the singleton-dim affine specs —
    # the b4 case above has fold_m == B and cannot catch a regression
    # there (BENCH r4 run1 crashed on a fold_m=2 pick). 384 channels:
    # the round-5 _PREF_L policy moved the c >= 512 b8 shapes to
    # weight-resident regime L, so the UNet's 320->384-ch class is now
    # the graph's fold_m=2 representative (b8 64^2x320, matrix2).
    # extra_bias rides along to cover the (fold_m, 1, TCo) eb spec too.
    w8, b8_ = t(3, 3, 384, 384, scale=0.02), t(384, scale=0.1)
    x8 = t(8, 64, 64, 384)
    a8 = jnp.ones((8, 384), jnp.float32)
    b8b = jnp.zeros((8, 384), jnp.float32)
    eb8 = t(8, 384, scale=0.1).astype(jnp.float32)
    assert fc._pick_tiles(64, 64, 384, 384, 2, bsz=8)[4] not in (0, 8), \
        "shape no longer picks a fold_m < 8 — pick another smoke shape"
    y8 = fc.fused_gn_silu_conv3x3(x8, w8, b8_, a=a8, b=b8b, extra_bias=eb8)
    ok("gn_silu_conv_folded_b8_m2", y8[0])
    # b8 weight-resident regime L (the round-5 _PREF_L pick): c >= 512 at
    # bsz > 1 now runs the (b, i) grid with the full weight tensor
    # resident (nco == 1) — the exact class the policy moved off fold
    w5, b5_ = t(3, 3, 512, 512, scale=0.02), t(512, scale=0.1)
    x5 = t(8, 64, 64, 512)
    a5 = jnp.ones((8, 512), jnp.float32)
    b5b = jnp.zeros((8, 512), jnp.float32)
    pk = fc._pick_tiles(64, 64, 512, 512, 2, bsz=8)
    assert pk[4] == 0 and pk[1] == 512, \
        f"b8 64^2x512 no longer picks weight-resident regime L: {pk}"
    y5 = fc.fused_gn_silu_conv3x3(x5, w5, b5_, a=a5, b=b5b)
    ok("gn_silu_conv_b8_resident", y5[0])
    # b8 regime-L (big-spatial, NON-fold, nbuf=2 multi-tile grid) — the
    # bench's b8 decoder path; 192^2 keeps the smoke fast
    xl8 = t(8, 192, 192, 128)
    al8 = jnp.ones((8, 128), jnp.float32)
    bl8 = jnp.zeros((8, 128), jnp.float32)
    assert fc._pick_tiles(192, 192, 128, 128, 2, bsz=8)[4] == 0, \
        "shape no longer lands in regime L — pick another smoke shape"
    yl8 = fc.fused_gn_silu_conv3x3(xl8, w, b, a=al8, b=bl8)
    ok("gn_silu_conv_b8_regimeL", yl8[0])
    # value-space compute path (FC_VS) at the decoder-class shape
    yvs = fc.fused_gn_silu_conv3x3(x1, w, b, a=a_, b=b_, vs=True)
    ok("gn_silu_conv_vs", yvs[0])
    # stride-2 downsample
    yd = fc.downsample2x_conv3x3(x1, w, b)
    ok("downsample2x", yd[0])
    # upsample + skip fusion
    skip = t(1, 128, 128, 128)
    skw = t(128, 128, scale=0.05)
    yu = fc.upsample2x_conv3x3(x1, w, b, skip_x=skip, skip_w=skw)
    ok("upsample2x_skip", yu[0])
    # flash attention fwd + dedicated Pallas bwd (the _mha_flash custom
    # VJP — dq + dkv kernels from the saved logsumexp)
    q = t(1, 1024, 512)
    k_, v = t(1, 1024, 512), t(1, 1024, 512)

    def loss(q_, k2, v2):
        return attn._mha_flash(q_, k2, v2, 8).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k_, v)
    ok("flash_fwd_bwd", *g)


def stage_entry():
    import jax
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    print(f"  entry 512^2 OK: {out.shape} {out.dtype}")


def stage_odd():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from img2img_turbo_tpu.models import unet as unet_mod, vae as vae_mod
    from img2img_turbo_tpu.pipelines.pix2pix import GeneratorConfigs
    from img2img_turbo_tpu.serving.engine import ServingEngine

    cfgs = GeneratorConfigs()
    dt = jnp.bfloat16

    def mk(shapes):
        return jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.001, dt), shapes)

    params = {
        "unet": mk(jax.eval_shape(
            lambda k: unet_mod.init_unet(k, cfgs.unet),
            jax.random.PRNGKey(0))),
        "vae": mk(jax.eval_shape(
            lambda k: vae_mod.init_vae(k, cfgs.vae), jax.random.PRNGKey(0))),
    }
    engine = ServingEngine(params, cfgs, mode="edge_to_image", dtype=dt,
                           donate_input=False)
    img = jnp.asarray(np.random.RandomState(2).randint(
        0, 255, (1, 560, 840, 3)).astype(np.uint8))
    ctx = jnp.zeros((1, 77, cfgs.unet.cross_attention_dim), dt)
    out = np.asarray(engine(img, ctx))
    assert out.shape == (1, 560, 840, 3), out.shape
    print(f"  odd 840x560 OK: {out.shape} {out.dtype}")


def run_stage_inproc(name: str) -> None:
    _setup_jax()
    globals()[f"stage_{name}"]()
    print(f"stage {name}: OK")


def main(argv):
    if argv:  # in-process selected stages
        for name in argv:
            run_stage_inproc(name)
        return 0
    failed = []
    for name in STAGES:
        print(f"=== stage {name} ===", flush=True)
        for attempt in (1, 2):  # one retry: tunnel 500s are transient
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                timeout=3600)
            if r.returncode == 0:
                break
            print(f"stage {name} attempt {attempt} rc={r.returncode}",
                  flush=True)
        else:
            failed.append(name)
    if failed:
        print(f"TPU SMOKE FAILED: {failed}")
        return 1
    print("TPU SMOKE: all stages OK")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
