"""Repro: flash_attention_v5 compile failure at s=16384 on the real chip.

The r3 sweep showed v5 compiling fine at s<=4096 but failing with
`tpu_compile_helper subprocess exit code 1` at s=16384 for every block_q.
This prints the full compiler error for one such shape.
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from diffuman4d_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp

from diffuman4d_tpu.ops.flash_attention import flash_attention_v5

b, s, h, d = 32, 16384, 5, 64
q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d), jnp.bfloat16)
bq = int(sys.argv[1]) if len(sys.argv) > 1 else 256
try:
    out = flash_attention_v5(q, q, q, block_q=bq)
    print("OK", float(out.astype(jnp.float32).sum()))
except Exception as e:  # noqa: BLE001
    print("FULL ERROR:\n", str(e))
