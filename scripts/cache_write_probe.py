"""Probe: vector-position stacked-cache writes — vmap(DUS) vs scatter.

The serving engine writes one column per slot at per-slot positions into
the stacked [L, B, HD, S] cache each layer step. The vmap-of-DUS
formulation profiled as FULL stacked-cache copies per layer (~206 us for
67 MB — 55% of serving decode). Candidates measured here inside one
jitted scan-over-layers × fori-over-steps (decode-shaped; value-fetch
synced):

  a) vmap(dynamic_update_slice)  (current)
  b) .at[l, arange(B), :, pos].set  (single scatter)
  c) .at with mode="drop" + unique_indices hints
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

L, B, HD, S, Hkv = 32, 8, 1024, 256, 8
STEPS = 16


def run(name, write_fn):
    kq0 = jnp.zeros((L, B, HD, S), jnp.int8)
    vq0 = jnp.zeros((L, B, S, HD), jnp.int8)
    newk = jnp.ones((B, HD), jnp.int8)
    newv = jnp.ones((B, HD), jnp.int8)

    @jax.jit
    def prog(kq, vq, pos0):
        def step(carry, _):
            kq, vq, pos = carry

            def layer(c, l):
                kq, vq = c
                kq = write_fn(kq, newk, pos, l, kind="k")
                vq = write_fn(vq, newv, pos, l, kind="v")
                return (kq, vq), None

            (kq, vq), _ = jax.lax.scan(
                layer, (kq, vq), jnp.arange(L, dtype=jnp.int32)
            )
            return (kq, vq, pos + 1), None

        (kq, vq, _), _ = jax.lax.scan(
            step, (kq, vq, pos0), None, length=STEPS
        )
        return kq, vq

    pos0 = jnp.arange(B, dtype=jnp.int32) * 3 + 1
    o = prog(kq0, vq0, pos0)
    int(o[0][0, 0, 0, 0])  # compile+sync
    t0 = time.perf_counter()
    o = prog(kq0, vq0, pos0)
    int(o[0][0, 0, 0, 0])
    dt = time.perf_counter() - t0
    per_layer_us = dt / STEPS / L * 1e6
    print(f"{name:24s} {dt*1e3:8.1f} ms total   "
          f"{per_layer_us:7.1f} us/layer-step (k+v)", flush=True)
    return o


def w_vmap_dus(arr, new, pos, l, kind):
    if kind == "k":  # [L,B,HD,S], write column at [l, b, :, pos[b]]
        def upd(c, nv, p):  # c [L, HD, S]
            return jax.lax.dynamic_update_slice(c, nv[None, :, None], (l, 0, p))
        return jax.vmap(upd, in_axes=(1, 0, 0), out_axes=1)(arr, new, pos)
    else:       # [L,B,S,HD], write row at [l, b, pos[b], :]
        def upd(c, nv, p):
            return jax.lax.dynamic_update_slice(c, nv[None, None, :], (l, p, 0))
        return jax.vmap(upd, in_axes=(1, 0, 0), out_axes=1)(arr, new, pos)


def w_at_scatter(arr, new, pos, l, kind):
    b = jnp.arange(B)
    if kind == "k":
        return arr.at[l, b, :, pos].set(new)
    return arr.at[l, b, pos, :].set(new)


def w_at_scatter_hints(arr, new, pos, l, kind):
    b = jnp.arange(B)
    if kind == "k":
        return arr.at[l, b, :, pos].set(
            new, mode="drop", unique_indices=True
        )
    return arr.at[l, b, pos, :].set(
        new, mode="drop", unique_indices=True
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    run("vmap_dus(current)", w_vmap_dus)
    run("at_scatter", w_at_scatter)
    run("at_scatter_hints", w_at_scatter_hints)
    # correctness cross-check
    import numpy as np
    o1 = run("vmap_dus(check)", w_vmap_dus)
    o2 = run("at_scatter(check)", w_at_scatter)
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))
    np.testing.assert_array_equal(np.asarray(o1[1]), np.asarray(o2[1]))
    print("scatter == vmap_dus results OK")


# -- follow-up probes: which write copies, and a manual windowed scatter --

def w_at_k_only(arr, new, pos, l, kind):
    if kind == "k":
        return w_at_scatter_hints(arr, new, pos, l, kind)
    return arr  # skip v


def w_at_v_only(arr, new, pos, l, kind):
    if kind == "v":
        return w_at_scatter_hints(arr, new, pos, l, kind)
    return arr


def w_manual_scatter(arr, new, pos, l, kind):
    """K: lax.scatter with the window on HD (operand dim 2) — no
    operand transpose, indices (l, b, pos_b) per row."""
    if kind == "v":
        return w_at_scatter_hints(arr, new, pos, l, kind)
    Bn = new.shape[0]
    lvec = jnp.full((Bn, 1), l, jnp.int32)
    idx = jnp.concatenate(
        [lvec, jnp.arange(Bn, dtype=jnp.int32)[:, None],
         pos[:, None].astype(jnp.int32)], axis=1
    )  # [B, 3] -> (l, b, s)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,),          # HD window in updates
        inserted_window_dims=(0, 1, 3),   # l, b, s are scattered dims
        scatter_dims_to_operand_dims=(0, 1, 3),
    )
    return jax.lax.scatter(
        arr, idx, new, dn,
        indices_are_sorted=True, unique_indices=True,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
    )


if os.environ.get("PROBE_FOLLOWUP") == "1":
    print("-- followup --", flush=True)
    run("at_k_only", w_at_k_only)
    run("at_v_only", w_at_v_only)
    run("manual_scatter_k", w_manual_scatter)
    import numpy as np
    o1 = run("vmap_dus(chk2)", w_vmap_dus)
    o2 = run("manual_scatter(chk2)", w_manual_scatter)
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))
    print("manual scatter correct")
