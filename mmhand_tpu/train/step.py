"""The jitted GAN train step.

Reproduces the reference update schedule exactly
(reference models/MMHandModel.py:310-330): one G step, then DG_ratio D_PP
steps, then DG_ratio D_PB steps — with the generator forward run ONCE at the
top, so the D phases train on fakes from the *pre-update* generator
(reference :312 forward precedes :316 G step).

TPU-native differences from the reference trainer:
* everything below is one traced function — G fwd/bwd, both D phases, pool
  replay, Adam updates — compiled by XLA into a single program per step; no
  host sync between phases.
* data parallelism: run under shard_map with `axis_name` set; gradients and
  metrics are `pmean`'d over the axis (the NCCL all-reduce equivalent,
  reference MMHandModel.py:109-116) and BatchNorm syncs batch statistics
  via the same axis name.
* bf16 compute needs no AMP loss scaling, so the reference's overflow vote
  (reference :294-308) is off by default; PrecisionConfig.loss_scaling=True
  (fp16 parity experiments) enables the TPU-native counterpart — dynamic
  per-loss scalers, cross-replica overflow vote, sticky within-step update
  skipping (train/precision.py).
* the per-epoch LR schedule is applied by passing `lr` as a traced scalar —
  no re-jit per epoch (reference steps torch schedulers per epoch,
  models/base_model.py:83-87).

Loss contract (reference get_current_errors, MMHandModel.py:332-341):
{pair_L1loss, D_PP, D_PB, pair_GANloss, origin_L1, perceptual}.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from mmhand_tpu.train.pool import pool_query
from mmhand_tpu.train.state import MMHandSystem, MMHandTrainState, NetState
from mmhand_tpu.losses.gan import gan_loss


def lr_for_epoch(cfg, epoch: int) -> float:
    """Per-epoch LR for the stateless policies
    (reference models/network_utils.py:87-101).

    lambda: linear decay to zero over niter_decay epochs after niter.
    step: x0.1 every lr_decay_iters epochs.
    plateau is stateful — use LRSchedule.
    """
    o = cfg.optim
    if o.lr_policy == "lambda":
        mult = 1.0 - max(0, epoch + 1 + o.epoch_count - o.niter) / float(
            o.niter_decay + 1)
        return o.lr * mult
    if o.lr_policy == "step":
        return o.lr * (0.1 ** (epoch // o.lr_decay_iters))
    raise NotImplementedError(f"lr policy [{o.lr_policy}]")


class LRSchedule:
    """Stateful per-epoch LR schedule covering all three reference policies
    (reference models/network_utils.py:87-109).

    `epoch_lr(epoch, metric)` returns the LR for the coming epoch; `metric`
    is last epoch's mean G objective and is only consulted by the plateau
    policy — torch semantics of ReduceLROnPlateau(mode='min', factor=0.2,
    threshold=0.01 rel, patience=5, cooldown=0).  NOTE: the reference could
    never actually run plateau — its `scheduler.step()` passes no metric
    (reference models/base_model.py:83-87), a TypeError at the first epoch
    boundary.  We implement the policy the flag promises instead of
    reproducing the crash.
    """

    FACTOR = 0.2
    THRESHOLD = 0.01
    PATIENCE = 5

    def __init__(self, cfg):
        self.cfg = cfg
        self.policy = cfg.optim.lr_policy
        self._lr = cfg.optim.lr
        self._best = float("inf")
        self._num_bad = 0
        if self.policy not in ("lambda", "step", "plateau"):
            raise NotImplementedError(f"lr policy [{self.policy}]")

    def epoch_lr(self, epoch: int, metric: Optional[float] = None) -> float:
        if self.policy != "plateau":
            return lr_for_epoch(self.cfg, epoch)
        if metric is not None:
            if metric < self._best * (1.0 - self.THRESHOLD):
                self._best = metric
                self._num_bad = 0
            else:
                self._num_bad += 1
            if self._num_bad > self.PATIENCE:
                self._lr *= self.FACTOR
                self._num_bad = 0
        return self._lr

    def state_dict(self) -> dict:
        return {"lr": self._lr, "best": self._best, "num_bad": self._num_bad}

    def load_state_dict(self, d: dict) -> None:
        self._lr, self._best, self._num_bad = (
            d["lr"], d["best"], d["num_bad"])


def make_train_step(system: MMHandSystem, l1_loss):
    """Build the train step closure.

    Args:
      system: static MMHandSystem.
      l1_loss: L1PlusPerceptual instance or None (plain L1, --L1_type origin).
    Returns:
      step(state, batch, lr) -> (state, metrics); batch is a dict with NHWC
      float32 H1,P1,D1,H2,P2,D2 (P* are (B,H,W,21) heatmaps).

    Note: a fused real+fake D forward (one concatenated batch per phase)
    was measured in round 1 and REJECTED — no throughput gain (XLA already
    pipelines the two forwards) and the joint BatchNorm statistics let D
    separate real/fake through batch stats, collapsing D loss ~5.1 -> ~1.4
    in one step (a known GAN pathology).  The reference uses separate
    forwards (reference backward_D_basic MMHandModel.py:263-274).
    """
    cfg = system.config
    lam_gan = cfg.loss.lambda_gan
    gan_mode = cfg.loss.gan_mode
    dg_ratio = cfg.optim.dg_ratio
    axis = system.axis_name
    scaling = cfg.precision.loss_scaling
    if scaling:
        from mmhand_tpu.train import precision as amp

    def psync(tree):
        return jax.lax.pmean(tree, axis) if axis else tree

    def pvote(flag):
        """OR-reduce a per-replica overflow flag (the reference's
        reduce_tensor vote, MMHandModel.py:301-306)."""
        if axis:
            return jax.lax.pmax(flag.astype(jnp.int32), axis) > 0
        return flag

    def l1_terms(fake, real):
        if l1_loss is None:
            # --L1_type origin: plain unweighted L1 (reference :81-82)
            l1 = jnp.mean(jnp.abs(fake - real))
            return l1, l1, jnp.zeros((), jnp.float32)
        return l1_loss(fake, real)

    def apply_d(module, net: NetState, x, dropout_rng, train=True):
        out, new_vars = module.apply(
            {"params": net.params, "batch_stats": net.batch_stats},
            x, train=train, mutable=["batch_stats"],
            rngs={"dropout": dropout_rng})
        return out, new_vars["batch_stats"]

    def d_phase(module, net: NetState, opt_state, real, fake_pool, rng, lr,
                scale=None, overflow_in=None):
        """One discriminator step (reference backward_D_basic :263-274).

        With loss scaling on, `scale` is this loss's LossScaleState and
        `overflow_in` the sticky step-level flag; returns the updated
        scale and flag alongside (both None when scaling is off).
        BatchNorm batch-stat updates are kept even on overflow (torch
        updates running stats during the forward regardless of whether
        optimizer.step() runs)."""
        k1, k2 = jax.random.split(rng)

        def loss_fn(params):
            p = NetState(params, net.batch_stats)
            pred_real, bs1 = apply_d(module, p, real, k1)
            loss_real = gan_loss(pred_real, True, gan_mode) * lam_gan
            pred_fake, bs2 = apply_d(
                module, NetState(params, bs1), fake_pool, k2)
            loss_fake = gan_loss(pred_fake, False, gan_mode) * lam_gan
            loss = (loss_real + loss_fake) * 0.5
            if scale is not None:
                loss = loss * scale.scale
            return loss, bs2

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(net.params)
        overflow = new_scale = None
        if scale is not None:
            grads = amp.unscale(grads, scale)
            loss = loss / scale.scale
            ovf = pvote(amp.grads_overflow(grads))
            new_scale = amp.update_scale(scale, ovf)
            overflow = jnp.logical_or(overflow_in, ovf)
        grads = psync(grads)
        updates, new_opt = system.tx.update(grads, opt_state, net.params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(net.params, updates)
        if scale is not None:
            ok = jnp.logical_not(overflow)
            new_params = amp.select(ok, new_params, net.params)
            new_opt = amp.select(ok, new_opt, opt_state)
        return loss, NetState(new_params, new_stats), new_opt, \
            new_scale, overflow

    def train_step(state: MMHandTrainState, batch, lr):
        rng = state.rng
        if axis:
            # decorrelate dropout/pool randomness across replicas
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        rng, next_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        k_gdrop, k_dpb, k_dpp, k_pool_pb, k_pool_pp = jax.random.split(rng, 5)

        h1, p1, d1 = batch["H1"], batch["P1"], batch["D1"]
        h2, p2, d2 = batch["H2"], batch["P2"], batch["D2"]
        g_in = (h1, jnp.concatenate([p1, p2], -1),
                jnp.concatenate([d1, d2], -1))

        # ------------------------------------------------------ G phase
        def g_loss_fn(g_params):
            fake, g_vars = system.generator.apply(
                {"params": g_params, "batch_stats": state.g.batch_stats},
                g_in, train=True, mutable=["batch_stats"],
                rngs={"dropout": k_gdrop})
            # D forwards for the G objective use current D params; their
            # batch-stat updates are discarded (torch updates running stats
            # here too, but those only matter at eval — noted divergence).
            # _gsplit variants share the D param trees but compute the 7x7
            # stem as two channel-block convs split at the fake|conditioning
            # boundary, so only the fake image's input-grad conv survives
            # the backward pass (state.py).
            pred_pb, _ = apply_d(
                system.d_pb_gsplit, state.d_pb,
                jnp.concatenate([fake, p2], -1), k_dpb)
            pred_pp, _ = apply_d(
                system.d_pp_gsplit, state.d_pp,
                jnp.concatenate([fake, h1], -1), k_dpp)
            loss_gan_pb = gan_loss(pred_pb, True, gan_mode)
            loss_gan_pp = gan_loss(pred_pp, True, gan_mode)
            pair_l1, origin_l1, percep = l1_terms(fake, h2)
            pair_gan = (loss_gan_pb * lam_gan + loss_gan_pp * lam_gan) / 2.0
            loss = pair_l1 + pair_gan
            if scaling:
                loss = loss * state.scales["g"].scale
            aux = (fake, g_vars["batch_stats"],
                   {"pair_L1loss": pair_l1, "pair_GANloss": pair_gan,
                    "origin_L1": origin_l1, "perceptual": percep})
            return loss, aux

        (_, (fake, g_stats, g_metrics)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g.params)
        # sticky within-step overflow flag: an earlier phase's overflow
        # skips every later optimizer update too (reference
        # optimize_parameters :315-328 checks self.overflow before each
        # step; reset at :330 == our per-step re-derivation)
        overflow = scales = None
        if scaling:
            g_grads = amp.unscale(g_grads, state.scales["g"])
            ovf_g = pvote(amp.grads_overflow(g_grads))
            scales = dict(state.scales,
                          g=amp.update_scale(state.scales["g"], ovf_g))
            overflow = ovf_g
        g_grads = psync(g_grads)
        g_updates, opt_g = system.tx.update(g_grads, state.opt_g, state.g.params)
        g_updates = jax.tree.map(lambda u: u * lr, g_updates)
        g_params = optax.apply_updates(state.g.params, g_updates)
        if scaling:
            ok = jnp.logical_not(overflow)
            g_params = amp.select(ok, g_params, state.g.params)
            opt_g = amp.select(ok, opt_g, state.opt_g)
        g = NetState(g_params, g_stats)

        fake = jax.lax.stop_gradient(fake)

        # --------------------------------------------- D_PP phase (xDG)
        real_pp = jnp.concatenate([h2, h1], -1)
        fake_pp_full = jnp.concatenate([fake, h1], -1)
        d_pp, opt_d_pp, pool_pp = state.d_pp, state.opt_d_pp, state.pool_pp
        loss_d_pp = jnp.zeros((), jnp.float32)
        for i in range(dg_ratio):
            k_i = jax.random.fold_in(k_pool_pp, i)
            pool_pp, fake_pp = pool_query(pool_pp, fake_pp_full, k_i)
            loss_d_pp, d_pp, opt_d_pp, sc, overflow = d_phase(
                system.d_pp, d_pp, opt_d_pp, real_pp, fake_pp,
                jax.random.fold_in(k_dpp, i + 1), lr,
                scale=scales["d_pp"] if scaling else None,
                overflow_in=overflow)
            if scaling:
                scales = dict(scales, d_pp=sc)

        # --------------------------------------------- D_PB phase (xDG)
        real_pb = jnp.concatenate([h2, p2], -1)
        fake_pb_full = jnp.concatenate([fake, p2], -1)
        d_pb, opt_d_pb, pool_pb = state.d_pb, state.opt_d_pb, state.pool_pb
        loss_d_pb = jnp.zeros((), jnp.float32)
        for i in range(dg_ratio):
            k_i = jax.random.fold_in(k_pool_pb, i)
            pool_pb, fake_pb = pool_query(pool_pb, fake_pb_full, k_i)
            loss_d_pb, d_pb, opt_d_pb, sc, overflow = d_phase(
                system.d_pb, d_pb, opt_d_pb, real_pb, fake_pb,
                jax.random.fold_in(k_dpb, i + 1), lr,
                scale=scales["d_pb"] if scaling else None,
                overflow_in=overflow)
            if scaling:
                scales = dict(scales, d_pb=sc)

        metrics = dict(g_metrics, D_PP=loss_d_pp, D_PB=loss_d_pb)
        if scaling:
            # extra observability key, only present in scaled runs (the
            # 6-key reference loss contract is unchanged by default)
            metrics["amp_overflow"] = overflow.astype(jnp.float32)
        metrics = psync(metrics)

        new_state = state.replace(
            step=state.step + 1, g=g, d_pb=d_pb, d_pp=d_pp,
            opt_g=opt_g, opt_d_pb=opt_d_pb, opt_d_pp=opt_d_pp,
            pool_pb=pool_pb, pool_pp=pool_pp, rng=next_rng,
            scales=scales if scaling else state.scales)
        return new_state, metrics

    return train_step


def make_eval_step(system: MMHandSystem):
    """Generator-only forward for aug/eval (reference MMHandModel.test
    :223-230, aug.py:49-53)."""

    @functools.partial(jax.jit, static_argnames=())
    def eval_step(g: NetState, batch):
        g_in = (batch["H1"],
                jnp.concatenate([batch["P1"], batch["P2"]], -1),
                jnp.concatenate([batch["D1"], batch["D2"]], -1))
        return system.generator.apply(
            {"params": g.params, "batch_stats": g.batch_stats},
            g_in, train=False)

    return eval_step
