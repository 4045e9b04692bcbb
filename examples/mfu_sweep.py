"""Sweep xlm-roberta-large train-step shapes/policies for MFU on one chip.

VERDICT r4 #3: raise train_large_mfu from 0.438 to >= 0.55. The base
model gained +0.23 MFU going B16->B64 at the same S, so the first lever
is batch; the second is the remat policy; the third is optimizer-state
HBM traffic (Adam reads/writes ~5 f32 copies of 550M params per step,
~20 ms of pure bandwidth at v5e rates).

Each config runs in-process; RESOURCE_EXHAUSTED is caught and reported
as OOM so the sweep continues. Usage:  python examples/mfu_sweep.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from kbner_tpu.models import TaggerConfig, XLMRConfig, init_tagger
from kbner_tpu.train.optim import make_finetune_optimizer

PEAK = 197e12
S, W = 256, 128
NUM_TAGS = 12


def run_cfg(B, remat_policy, mu_bf16=False, n_steps=5):
    enc = XLMRConfig.large(remat=True, remat_policy=remat_policy)
    cfg = TaggerConfig(encoder=enc, num_tags=NUM_TAGS,
                       start_idx=NUM_TAGS - 2, stop_idx=NUM_TAGS - 1)
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(
            4, enc.vocab_size - 1, size=(B, S)).astype(np.int32)),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "word_starts": jnp.asarray(np.tile(
            np.arange(1, W + 1, dtype=np.int32), (B, 1))),
        "word_mask": jnp.ones((B, W), jnp.int32),
        "tag_ids": jnp.asarray(rng.randint(
            0, NUM_TAGS - 2, size=(B, W)).astype(np.int32)),
        "crf_mask": jnp.ones((B, W), jnp.int32),
        "lang_ids": jnp.zeros((B,), jnp.int32),
    }
    model, params = init_tagger(cfg, jax.random.PRNGKey(0), batch)
    tx = make_finetune_optimizer(
        params, lr=5e-6, lr_rate=20.0, warmup_steps=100, total_steps=10000,
        mu_dtype=jnp.bfloat16 if mu_bf16 else None)
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            return model.apply(p, batch, deterministic=False,
                               method=model.loss, rngs={"dropout": key})
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
        return params, opt_state, loss

    key = jax.random.PRNGKey(1)
    for _ in range(2):
        params, opt_state, loss = step(params, opt_state, batch, key)
        float(loss)
    t0 = time.perf_counter()
    prev = None
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state, batch, key)
        if prev is not None:
            float(prev)
        prev = loss
    float(prev)
    dt = (time.perf_counter() - t0) / n_steps
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    mfu = 6 * n_params * B * S / dt / PEAK
    del params, opt_state
    return dt, mfu


def main():
    configs = [
        (16, "dots_saveable", False),            # r4 shipped baseline
        (32, "dots_saveable", False),
        (32, None, False),                       # full remat
        (32, "dots_with_no_batch_dims_saveable", False),
        (48, None, False),
        (32, "dots_saveable", True),             # bf16 first moment
        (64, None, False),
    ]
    for B, pol, mu in configs:
        tag = f"B{B} pol={pol or 'full'}{' mu_bf16' if mu else ''}"
        try:
            dt, mfu = run_cfg(B, pol, mu)
            print(f"{tag}: {dt * 1e3:.1f} ms/step, "
                  f"{B * S / dt:.0f} subtok/s, MFU {mfu:.3f}", flush=True)
        except Exception as e:  # noqa: BLE001 — OOM keeps the sweep going
            msg = str(e).splitlines()[0][:120]
            print(f"{tag}: FAILED ({msg})", flush=True)


if __name__ == "__main__":
    main()
