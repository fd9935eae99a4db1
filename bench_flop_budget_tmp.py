"""Per-component XLA FLOP counts at the 256px b2 train shape (CPU lowering,
abstract shapes -- no execution). Pallas custom calls count as 0."""
import jax
import jax.numpy as jnp

SIZE, BATCH = 256, 2

from __graft_entry__ import _arc_batch, _flagship_model

overrides = [
    f"dataset.image_shape=[{SIZE},{SIZE}]",
    "model.remat=true",
    "model.decoder.remat=true",
    "model.decoder.precision=fast",
]
cfg, model = _flagship_model(overrides)
batch = _arc_batch(b=BATCH, v_ctx=2, v_tgt=4, h=SIZE, w=SIZE)
k = jax.random.PRNGKey(0)

params_shape = jax.eval_shape(
    lambda kk: model.init_params(kk, batch), jax.random.PRNGKey(0)
)
pg = params_shape["generator"]
pd = params_shape["discriminator"]
pl = params_shape["lpips"]


def flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    return float(c.get("flops", 0.0)) if c else 0.0


def _sum(tree):
    return sum(
        jnp.sum(x) for x in jax.tree.leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    )


def enc(p):
    g = model.apply_encoder(p, batch["context"], jnp.zeros((), jnp.int32), k,
                            deterministic=False)
    return _sum(g.means) + _sum(g.covariances) + _sum(g.opacities) \
        + _sum(g.color_harmonics) + _sum(g.feature_harmonics.mean)


print("encoder fwd      %.3e" % flops(enc, pg))
print("encoder fwd+bwd  %.3e" % flops(lambda p: _sum(jax.grad(enc)(p)), pg))

g_shape = jax.eval_shape(
    lambda p: model.apply_encoder(
        p, batch["context"], jnp.zeros((), jnp.int32), k, deterministic=False
    ).sample(k),
    pg,
)


def rend(means, covs, ops, csh, fsh):
    from latentsplat_tpu.ops.rasterize import render
    out = render(
        batch["target"]["extrinsics"], batch["target"]["intrinsics"],
        batch["target"]["near"], batch["target"]["far"],
        (SIZE, SIZE), jnp.zeros((BATCH, 3)),
        means, covs, ops, csh, fsh,
        max_tiles_per_gaussian=cfg.model.decoder.max_tiles_per_gaussian,
        pair_budget_factor=cfg.model.decoder.pair_budget_factor,
        precision="fast",
    )
    return jnp.sum(out.color) + jnp.sum(out.feature) + jnp.sum(out.mask)


ra = (g_shape.means, g_shape.covariances, g_shape.opacities,
      g_shape.color_harmonics, g_shape.feature_harmonics)
print("render fwd       %.3e" % flops(rend, *ra))
print("render fwd+bwd   %.3e" % flops(
    lambda *a: _sum(jax.grad(rend, argnums=(0, 1, 2, 3, 4))(*a)), *ra))

z = jax.ShapeDtypeStruct((BATCH * 4, SIZE // 8, SIZE // 8, 4), jnp.float32)
skip = jax.ShapeDtypeStruct((BATCH * 4, SIZE, SIZE, 7), jnp.float32) \
    if model.autoencoder.expects_skip_extra else None


def vae(p, zz):
    return jnp.sum(model.ae_decode(p, zz, skip and jnp.zeros(skip.shape)))


def vae2(p, zz, sk):
    return jnp.sum(model.ae_decode(p, zz, sk))


if skip is not None:
    print("vae_decode fwd   %.3e" % flops(vae2, pg, z, skip))
    print("vae_decode f+b   %.3e" % flops(
        lambda p, zz, sk: _sum(jax.grad(vae2, argnums=(0, 1))(p, zz, sk)), pg, z, skip))

img = jax.ShapeDtypeStruct((BATCH * 4, SIZE, SIZE, 3), jnp.float32)


def lp(x, t):
    return jnp.sum(model.lpips_fn(jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), pl))(x, t))


x0 = jnp.zeros(img.shape)
print("lpips fwd        %.3e" % flops(lp, img, img))
print("lpips f+b        %.3e" % flops(lambda x, t: _sum(jax.grad(lp)(x, t)), img, img))

imgs5 = jax.ShapeDtypeStruct((BATCH, 4, SIZE, SIZE, 3), jnp.float32)


def disc(x):
    return jnp.sum(model.discriminate(jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), pd), x))


print("disc fwd         %.3e" % flops(disc, imgs5))
print("disc f+b         %.3e" % flops(lambda x: _sum(jax.grad(disc)(x)), imgs5))

# VAE encode (context branch)
ctx_img = jax.ShapeDtypeStruct((BATCH, 2, SIZE, SIZE, 3), jnp.float32)


def ae_enc(p, x):
    post = model.ae_encode(p, x)
    return _sum(post.mean)


print("ae_encode fwd    %.3e" % flops(ae_enc, pg, ctx_img))
print("ae_encode f+b    %.3e" % flops(
    lambda p, x: _sum(jax.grad(ae_enc, argnums=(0,))(p, x)[0]), pg, ctx_img))
