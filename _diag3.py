import numpy as np
import jax
jax.config.update('jax_platforms','cpu')
import jax.numpy as jnp, optax
from gaussianimage_plus_tpu.models import GaussianConfig, init_state, render
from gaussianimage_plus_tpu.train.metrics import psnr as psnr_fn
from PIL import Image

img = Image.open('/root/reference/datasets/kodak/kodim01.png').resize((96, 64))
gt = jnp.asarray(np.asarray(img, np.float32)/255.0)
H, W, N = 64, 96, 300
cfg = GaussianConfig(H=H, W=W, max_num_points=N)
state0 = init_state(cfg, N, jax.random.PRNGKey(0))
bound = state0.bound

px = jnp.arange(W, dtype=jnp.float32)
py = jnp.arange(H, dtype=jnp.float32)

def pure_render(params):
    cov = params.cov2d + bound
    det = cov[:,0]*cov[:,2] - cov[:,1]**2
    c1 = cov[:,2]/det; c2 = -cov[:,1]/det; c3 = cov[:,0]/det
    dx = params.xyz[:,0][None,None,:] - px[None,:,None]
    dy = params.xyz[:,1][None,None,:] - py[:,None,None]
    sigma = 0.5*(c1[None,None,:]*dx*dx + c3[None,None,:]*dy*dy) + c2[None,None,:]*dx*dy
    alpha = jnp.minimum(1.0, jnp.exp(-sigma))
    w = jnp.where((sigma >= 0) & (alpha >= 1/255.), alpha, 0.0)
    img = jnp.einsum('hwn,nc->hwc', w, params.features)
    return jnp.clip(img, 0, 1)

def train(render_fn, lr=0.018, steps=3000):
    tx = optax.adam(lr, eps=1e-15, eps_root=0.0)
    state = state0
    opt = tx.init(state.params)
    @jax.jit
    def step(state, opt, gt):
        def obj(p):
            return jnp.mean((render_fn(p) - gt)**2)
        l, g = jax.value_and_grad(obj)(state.params)
        upd, opt = tx.update(g, opt, state.params)
        return state.replace(params=optax.apply_updates(state.params, upd)), opt, l
    for i in range(steps):
        state, opt, l = step(state, opt, gt)
    return float(psnr_fn(render_fn(state.params), gt)), state

p_pure, st = train(pure_render)
print('pure autodiff  3k:', round(p_pure,3), flush=True)

def our_render(p):
    return render(state0.replace(params=p), cfg)
p_ours, st2 = train(our_render)
print('custom path    3k:', round(p_ours,3), flush=True)

# longer horizon + lr sweep on pure
for lr in [0.006, 0.018, 0.05]:
    p, _ = train(pure_render, lr=lr, steps=12000)
    print(f'pure lr={lr} 12k:', round(p,3), flush=True)
