"""Train state + system container for the MM-Hand GAN.

The reference trainer (reference models/MMHandModel.py:26-384) holds three
networks, three Adam optimizers, two image pools and loss modules as python
object state.  Here everything device-side lives in ONE functional pytree
(`MMHandTrainState`) threaded through a jitted step, and everything static
(module definitions, loss callables, config) lives in `MMHandSystem`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mmhand_tpu.config import Config
from mmhand_tpu.losses.perceptual import L1PlusPerceptual
from mmhand_tpu.models.discriminator import Discriminator
from mmhand_tpu.models.generator import Generator
from mmhand_tpu.models.layers import NormConfig, OpImpl
from mmhand_tpu.train.pool import PoolState, pool_init


class NetState(NamedTuple):
    params: Any
    batch_stats: Any


class MMHandTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g: NetState
    d_pb: NetState
    d_pp: NetState
    opt_g: Any
    opt_d_pb: Any
    opt_d_pp: Any
    pool_pb: PoolState
    pool_pp: PoolState
    rng: jnp.ndarray
    # {'g','d_pp','d_pb'} -> LossScaleState when PrecisionConfig.loss_scaling
    # (train/precision.py); None (an empty pytree) otherwise.
    scales: Any = None


def make_optimizer(beta1: float, beta2: float):
    """Adam with torch-parity hyperparameters (lr applied dynamically in the
    step so the per-epoch schedule needs no re-jit; reference uses three
    torch.optim.Adam at lr 2e-4, betas (.5, .999) — MMHandModel.py:90-98)."""
    return optax.chain(
        optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-8),
        optax.scale(-1.0),
    )


@dataclasses.dataclass(frozen=True)
class MMHandSystem:
    """Static (non-pytree) bundle: modules, optimizer, losses, config.

    `axis_name` names the data mesh axis when the step runs under
    shard_map; None for single-device jit.  BatchNorm picks it up for
    cross-replica statistics (sync-BN equivalent).
    """

    config: Config
    axis_name: Optional[str] = None

    def __post_init__(self):
        # MMHAND_* env overrides of the implementation knobs apply HERE,
        # once, at system build (profiling escape hatch — tools/stem_ab.sh
        # legs); traced model code reads only the dataclass fields.
        m = self.config.model.with_env_overrides()
        impl = OpImpl.from_model_config(m)
        norm = NormConfig(kind=m.norm, axis_name=self.axis_name)
        dtype = {"bfloat16": jnp.bfloat16, "float16": jnp.float16}.get(
            self.config.precision.compute_dtype, jnp.float32)
        object.__setattr__(self, "generator", Generator(
            input_nc=m.g_input_nc, output_nc=m.output_nc, ngf=m.ngf,
            n_blocks=m.g_n_blocks, n_downsampling=m.g_n_downsampling,
            norm=norm, use_dropout=m.use_dropout_g,
            pad_mode=m.padding_type, dtype=dtype, remat=m.g_remat,
            impl=impl, stem_fused=m.g_stem_fused))
        disc = lambda **kw: Discriminator(
            ndf=m.ndf, n_blocks=m.n_layers_d,
            n_downsampling=m.d_n_downsampling, norm=norm,
            use_dropout=m.use_dropout_d, pad_mode=m.padding_type, dtype=dtype,
            impl=impl, **kw)
        object.__setattr__(self, "d_pb", disc())
        object.__setattr__(self, "d_pp", disc())
        # Same parameter tree, stem computed as two channel-block convs
        # split at the generated-image boundary (bit-equivalent); used for
        # the G-loss applies only, where the conditioning channels carry no
        # gradient — their MXU-starved 7x7 input-grad conv dead-codes away
        # (r3 profile: 9.07 + 4.64 ms/step).  ModelConfig.dstem_split.
        split = m.output_nc if m.dstem_split else 0
        object.__setattr__(self, "d_pb_gsplit", disc(stem_grad_split=split))
        object.__setattr__(self, "d_pp_gsplit", disc(stem_grad_split=split))
        object.__setattr__(self, "tx", make_optimizer(
            self.config.optim.beta1, self.config.optim.beta2))

    def make_l1_loss(self, vgg_variables):
        lc = self.config.loss
        if lc.l1_type == "origin":
            return None  # plain L1 handled inline in the step
        dtype = {"bfloat16": jnp.bfloat16, "float16": jnp.float16}.get(
            self.config.precision.compute_dtype, jnp.float32)
        return L1PlusPerceptual(
            lambda_l1=lc.lambda_a, lambda_perceptual=lc.lambda_b,
            perceptual_layers=lc.perceptual_layers,
            percep_is_l1=lc.percep_is_l1, vgg_variables=vgg_variables,
            dtype=dtype)

    def init_state(self, rng, local_batch_size: Optional[int] = None
                   ) -> MMHandTrainState:
        """Initialize all network/optimizer/pool state.

        `local_batch_size` sizes the dummy init batch (shapes only).

        On a non-CPU backend the whole init runs with the host CPU as
        default device and the finished state is device_put to the
        accelerator: flax init is eager, and through the axon TPU tunnel
        each op dispatch is a network round-trip (~180 s measured for
        this init; ~seconds on host + one bulk transfer)."""
        import jax as _jax
        try:
            if _jax.default_backend() != "cpu":
                cpu = _jax.devices("cpu")[0]
                with _jax.default_device(cpu):
                    state = self._init_state_impl(rng, local_batch_size)
                return _jax.device_put(state, _jax.devices()[0])
        except RuntimeError:
            pass
        return self._init_state_impl(rng, local_batch_size)

    def _init_state_impl(self, rng, local_batch_size: Optional[int] = None
                         ) -> MMHandTrainState:
        m = self.config.model
        size = m.fine_size
        b = local_batch_size or 1
        k_g, k_pb, k_pp, k_drop, k_state = jax.random.split(rng, 5)

        g_in = (jnp.zeros((b, size, size, m.h_input_nc)),
                jnp.zeros((b, size, size, 2 * m.p_input_nc)),
                jnp.zeros((b, size, size, 2 * m.d_input_nc)))
        g_vars = self.generator.init(
            {"params": k_g, "dropout": k_drop}, g_in, train=False)
        d_pb_vars = self.d_pb.init(
            {"params": k_pb},
            jnp.zeros((b, size, size, m.d_pb_input_nc)), train=False)
        d_pp_vars = self.d_pp.init(
            {"params": k_pp},
            jnp.zeros((b, size, size, m.d_pp_input_nc)), train=False)

        # --init_type xavier/kaiming/orthogonal re-draw of conv kernels
        # (reference models/network_utils.py:23-72; 'normal' is a no-op)
        from mmhand_tpu.models.layers import apply_init_type
        init_type = self.config.model.init_type
        ki_g, ki_pb, ki_pp = jax.random.split(
            jax.random.fold_in(rng, 0x1217), 3)
        g = NetState(apply_init_type(g_vars["params"], init_type, ki_g),
                     g_vars.get("batch_stats", {}))
        d_pb = NetState(
            apply_init_type(d_pb_vars["params"], init_type, ki_pb),
            d_pb_vars.get("batch_stats", {}))
        d_pp = NetState(
            apply_init_type(d_pp_vars["params"], init_type, ki_pp),
            d_pp_vars.get("batch_stats", {}))

        pool = self.config.optim.pool_size
        # pool buffers in compute dtype: the replayed fakes feed straight
        # into the (bf16) D forward, so storing f32 only costs HBM — 433 MB
        # vs 216 MB at 256px/pool50, the round-1 batch>16 scaling wall
        pool_dtype = {"bfloat16": jnp.bfloat16,
                      "float16": jnp.float16}.get(
            self.config.precision.compute_dtype, jnp.float32)
        scales = None
        if self.config.precision.loss_scaling:
            from mmhand_tpu.train.precision import init_scales
            scales = init_scales()
        return MMHandTrainState(
            step=jnp.zeros((), jnp.int32),
            g=g, d_pb=d_pb, d_pp=d_pp,
            opt_g=self.tx.init(g.params),
            opt_d_pb=self.tx.init(d_pb.params),
            opt_d_pp=self.tx.init(d_pp.params),
            pool_pb=pool_init(pool, (size, size, m.d_pb_input_nc),
                              dtype=pool_dtype),
            pool_pp=pool_init(pool, (size, size, m.d_pp_input_nc),
                              dtype=pool_dtype),
            rng=k_state,
            scales=scales,
        )
