"""AOT-compiled training engine: layout-matched, state-donating step.

Same rationale as inference.InferenceEngine: a jit call whose device
arguments don't match the executable's preferred layouts silently falls
back to python dispatch and re-lays-out every parameter per call (~6 s
measured). The engine compiles the train step once for a fixed batch
shape (and optional mesh), device-puts the TrainState with the
executable's input formats, and donates the state so parameters update
in place (layout-stable across steps by XLA's aliasing rules).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .step import TrainState, loss_terms

import optax


class TrainEngine:
    def __init__(self, model, state: TrainState, batch_size, H=512, W=1024,
                 mesh=None):
        self.model = model
        self.mesh = mesh
        tx = state.tx

        def step_fn(state, x, y_bon, y_cor, rng):
            def loss_fn(params):
                out, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
                bon_pred, cor_pred = out
                bon_loss, cor_loss = loss_terms(bon_pred, cor_pred,
                                                y_bon, y_cor)
                return bon_loss + cor_loss, (bon_loss, cor_loss,
                                             mutated["batch_stats"])

            (total, (bon_loss, cor_loss, new_stats)), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1,
                                      params=new_params,
                                      batch_stats=new_stats,
                                      opt_state=new_opt)
            return new_state, {"total": total, "bon": bon_loss,
                               "cor": cor_loss}

        jitted = jax.jit(step_fn, donate_argnums=(0,))

        x_spec = jax.ShapeDtypeStruct((batch_size, H, W, 3), jnp.float32)
        yb_spec = jax.ShapeDtypeStruct((batch_size, 2, W), jnp.float32)
        yc_spec = jax.ShapeDtypeStruct((batch_size, 1, W), jnp.float32)
        rng_spec = jax.eval_shape(lambda: jax.random.PRNGKey(0))
        state_spec = jax.eval_shape(lambda: state)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import state_shardings

            data = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            # Batch sharded on 'data'; state sharded per the TP rules
            # (parallel/sharding.py): conv kernels + BN vectors go over
            # 'model' when the mesh has one, everything else replicates.
            # With n_model=1 this degenerates to the replicated layout.
            # out_shardings pins the NEW state to the same layout so the
            # donated feed-back loop is layout-stable across steps.
            state_sh = state_shardings(mesh, state_spec)
            jitted = jax.jit(
                step_fn, donate_argnums=(0,),
                in_shardings=(state_sh, data, data, data, repl),
                out_shardings=(state_sh, None),
            )

        self.compiled = jitted.lower(state_spec, x_spec, yb_spec, yc_spec,
                                     rng_spec).compile()
        fmts, _ = self.compiled.input_formats
        state_fmt, self._x_fmt, self._yb_fmt, self._yc_fmt, self._rng_fmt = fmts
        self.state = jax.device_put(state, state_fmt)
        jax.block_until_ready(self.state)

    def step(self, x, y_bon, y_cor, rng):
        """Run one training step; returns the metrics dict (device arrays).

        ``x`` may already be a device array (e.g. the output of the
        on-device augmentation) — it is re-laid-out on device, never
        round-tripped through host.
        """
        if not isinstance(x, jax.Array):
            # host arrays go to the target format in ONE device_put (a
            # jnp.asarray detour would commit them to the default device
            # first and transfer twice)
            x = np.asarray(x, np.float32)
        elif x.dtype != jnp.float32:
            x = x.astype(jnp.float32)
        x = jax.device_put(x, self._x_fmt)
        y_bon = jax.device_put(np.asarray(y_bon, np.float32), self._yb_fmt)
        y_cor = jax.device_put(np.asarray(y_cor, np.float32), self._yc_fmt)
        rng = jax.device_put(rng, self._rng_fmt)
        self.state, metrics = self.compiled(self.state, x, y_bon, y_cor, rng)
        return metrics

    def host_state(self) -> TrainState:
        """Fetch the current state to host (for checkpointing)."""
        return jax.tree.map(np.asarray, self.state)
