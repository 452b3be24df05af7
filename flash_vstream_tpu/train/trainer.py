"""pjit trainer: data-parallel with ZeRO-style sharded optimizer states,
gradient accumulation, parameter freezing, LoRA, and checkpointing.

Replaces the reference's DeepSpeed ZeRO trainer stack
(Flash-VStream-LLaVA/flash_vstream/train/vstream_trainer.py,
Flash-VStream-Qwen/finetune_flash.py:456-498, scripts/zero*.json):

- ZeRO stage-1/2 semantics = Adam moments sharded over the 'dp' mesh axis
  (parallel/sharding.zero_shardings); params replicated over 'dp', optionally
  TP-sharded over 'tp'.
- gradient accumulation as a lax.scan over microbatches inside one jit
  (the reference uses HF Trainer's python-side accumulation).
- separate learning rates per param group (mm_projector_lr,
  vstream_trainer.py:168-248) via optax.multi_transform.
- gradient checkpointing = remat flag threaded to the model's scan blocks.
"""
from __future__ import annotations

import dataclasses
import re
from functools import partial
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..parallel.sharding import (
    create_mesh,
    param_shardings,
    path_str,
    zero_shardings,
)


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 2e-5
    projector_lr: Optional[float] = None      # mm_projector_lr analog
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    grad_accum: int = 1
    max_grad_norm: float = 1.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    # regexes of param paths to train; None = train everything
    trainable: Optional[Sequence[str]] = None
    # regexes of param paths to freeze (applied after trainable)
    frozen: Sequence[str] = ()
    # dtype for Adam first moments (None = param dtype). bf16 halves the
    # mu buffers; the variance (nu) always stays f32
    mu_dtype: Optional[str] = None
    # ZeRO stage (reference scripts/zero{0..3}.json): 1/2 = params
    # replicated over 'dp', Adam moments dp-sharded (their gather is the
    # stage-1/2 collective). 3 = FSDP: params AND any frozen tree are also
    # dp-sharded; XLA all-gathers each layer's weights on use inside the
    # layer scan and reduce-scatters grads — per-device param memory drops
    # ~dp-fold at the cost of per-layer gather traffic.
    zero_stage: int = 2
    # Optimizer-state host offload (reference zero2_offload/zero3_offload
    # deepspeed configs): Adam moments live in HOST memory between steps
    # (pinned_host memory kind); each step streams them device-ward for the
    # update and back. Frees the moments' HBM share (2 extra param copies)
    # at the cost of PCIe traffic per step — the lever that buys full-7B
    # finetunes headroom on 16 GB chips (docs/DEPLOYMENT.md memory table).
    offload_moments: bool = False


def _label_params(params, cfg: TrainConfig):
    """'projector' / 'train' / 'frozen' label tree for multi_transform."""
    def one(path, x):
        p = path_str(path)
        if any(re.search(f, p) for f in cfg.frozen):
            return "frozen"
        if cfg.trainable is not None and not any(
                re.search(t, p) for t in cfg.trainable):
            return "frozen"
        if cfg.projector_lr is not None and p.startswith("projector"):
            return "projector"
        return "train"
    return jax.tree_util.tree_map_with_path(one, params)


def make_optimizer(cfg: TrainConfig, params) -> optax.GradientTransformation:
    def schedule(lr):
        warmup = max(int(cfg.total_steps * cfg.warmup_ratio), 1)
        return optax.join_schedules([
            optax.linear_schedule(0.0, lr, warmup),
            optax.cosine_decay_schedule(lr, max(cfg.total_steps - warmup, 1)),
        ], [warmup])

    def adamw(lr):
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(schedule(lr), b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                        weight_decay=cfg.weight_decay,
                        mu_dtype=cfg.mu_dtype),
        )

    labels = _label_params(params, cfg)
    return optax.multi_transform(
        {"train": adamw(cfg.learning_rate),
         "projector": adamw(cfg.projector_lr or cfg.learning_rate),
         "frozen": optax.set_to_zero()},
        labels)


class Trainer:
    """Sharded trainer. `loss_fn(params, batch, key) -> scalar loss`, or
    `loss_fn(params, batch, key, frozen)` when a `frozen` tree is given.

    `frozen` carries large non-trained parameters (e.g. the base model under
    LoRA) as a jit ARGUMENT: a loss that closes over them instead captures
    them as HLO constants — gigabytes of host serialization per compile and
    a hard failure through remote compile services (see CLAUDE.md)."""

    def __init__(self, loss_fn: Callable, params, cfg: TrainConfig,
                 mesh=None, donate_params: bool = True, frozen=None):
        self.cfg = cfg
        self.mesh = mesh or create_mesh(tp=1)
        self.optimizer = make_optimizer(cfg, params)
        fsdp = cfg.zero_stage >= 3
        shard_fn = zero_shardings if fsdp else param_shardings
        self.frozen = frozen
        if frozen is not None:
            with self.mesh:
                self.frozen = jax.jit(
                    lambda p: p,
                    out_shardings=shard_fn(self.mesh, frozen))(frozen)

        self.param_sharding = shard_fn(self.mesh, params)
        opt_state_shape = jax.eval_shape(self.optimizer.init, params)

        def opt_sharding_like(tree):
            # moments mirror param structure; shard like ZeRO where possible
            zs = zero_shardings(self.mesh, params)
            def one(x):
                return x
            # map each opt-state leaf to the zero sharding of the matching
            # param leaf when shapes match, else replicate
            flat_params = {path_str(p): s for p, s in
                           jax.tree_util.tree_leaves_with_path(zs)}
            shapes = {path_str(p): v.shape for p, v in
                      jax.tree_util.tree_leaves_with_path(params)}
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(self.mesh, P())

            def match(path, leaf):
                s = path_str(path)
                for pp, sh in flat_params.items():
                    if s.endswith(pp) and shapes[pp] == leaf.shape:
                        return sh
                return repl
            return jax.tree_util.tree_map_with_path(match, tree)

        self.opt_sharding = opt_sharding_like(opt_state_shape)

        # zero*_offload parity: moments' RESTING shardings get the host
        # memory kind; the compiled step round-trips them to device memory
        # around the optimizer update (jax memories API). On the CPU test
        # backend host kind == device kind, so the plumbing is exercised
        # with zero numerical difference.
        self._host_kind = None
        if cfg.offload_moments:
            dev0 = self.mesh.devices.flat[0]
            kinds = {m.kind for m in dev0.addressable_memories()}
            for cand in ("pinned_host", "unpinned_host"):
                if cand in kinds:
                    self._host_kind = cand
                    break
        self.opt_sharding_device = self.opt_sharding
        if self._host_kind is not None:
            # only moment ARRAYS move to host; scalars (step count, empty
            # states) stay device-resident — offloading them buys nothing
            # and a pinned_host annotation on an SPMD scalar RET_CHECK-fails
            # in XLA's partitioner
            self.opt_sharding = jax.tree.map(
                lambda s, a: (s.with_memory_kind(self._host_kind)
                              if a.size > 1024 else s),
                self.opt_sharding_device, opt_state_shape)

        with self.mesh:
            self.params = jax.jit(
                lambda p: p, out_shardings=self.param_sharding)(params)
            # memory-kind shardings can't ride jit out_shardings here: once
            # any output carries a kind, jax annotates EVERY output's
            # placement and XLA's SPMD partitioner RET_CHECK-fails on the
            # optimizer's scalar count. Init on device, then device_put
            # (outside jit) moves the resting moments to host memory.
            self.opt_state = jax.jit(
                self.optimizer.init,
                out_shardings=self.opt_sharding_device)(self.params)
            if self._host_kind is not None:
                self.opt_state = jax.device_put(self.opt_state,
                                                self.opt_sharding)
        self.step = 0

        self._donate = (0, 1) if donate_params else (1,)
        self._train_step = self.compile_step(loss_fn)

    def compile_step(self, loss_fn: Callable):
        """Compile a train step for `loss_fn` sharing this trainer's params,
        optimizer state and shardings. Used for shape-bucketed training
        (e.g. one step per video-resolution bucket): each bucket gets its own
        jitted step, all updating the same state via run_step(..., step_fn=)."""
        accum = self.cfg.grad_accum
        dp = self.mesh.shape["dp"]
        mesh = self.mesh

        def shard_batch(batch):
            """Split each microbatch over the dp axis (real data
            parallelism — without this constraint XLA replicates the batch
            and every device computes every sample). Leaves are
            [accum, per_step_batch, ...]; the per-step batch dim shards."""
            from jax.sharding import NamedSharding, PartitionSpec as P

            def one(x):
                if dp > 1 and x.ndim >= 2 and x.shape[1] % dp == 0:
                    return jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, P(None, "dp")))
                return x
            return jax.tree.map(one, batch)

        has_frozen = self.frozen is not None

        def train_step(params, opt_state, batch, key, frozen=None):
            # batch leaves: [accum, per_step_batch, ...]
            batch = shard_batch(batch)

            def micro_grads(params, mb, sub):
                if has_frozen:
                    return jax.value_and_grad(loss_fn)(params, mb, sub,
                                                       frozen)
                return jax.value_and_grad(loss_fn)(params, mb, sub)

            if accum == 1:
                # no accumulator tree: the scan path carries a zeroed
                # grad-shaped f32 tree plus an add per leaf, which at
                # production LoRA sizes is ~1 GB of pure overhead on the
                # peak-memory path
                _, sub = jax.random.split(key)
                loss, grads = micro_grads(
                    params, jax.tree.map(lambda x: x[0], batch), sub)
                losses = loss[None]
            else:
                def micro(carry, mb):
                    acc, key = carry
                    key, sub = jax.random.split(key)
                    loss, grads = micro_grads(params, mb, sub)
                    acc = jax.tree.map(lambda a, g: a + g / accum, acc,
                                       grads)
                    return (acc, key), loss

                zero = jax.tree.map(jnp.zeros_like, params)
                (grads, _), losses = jax.lax.scan(micro, (zero, key), batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, jnp.mean(losses)

        if self._host_kind is not None:
            # Offloaded moments run as a TWO-PHASE step. Phase 1 (grad) never
            # touches the optimizer state, so the moments are genuinely
            # absent from HBM during the activation-heavy fwd/bwd — the
            # actual peak-memory win of DeepSpeed's zero*_offload. Phase 2
            # streams them device-ward, applies Adam, and rests them back on
            # host. (In-jit device_put with memory kinds RET_CHECK-fails in
            # the SPMD partitioner on this jaxlib; outside-jit placement is
            # the portable path and costs one extra dispatch per step.)
            def grad_step(params, batch, key, frozen=None):
                batch = shard_batch(batch)
                if accum == 1:
                    _, sub = jax.random.split(key)
                    loss, grads = micro_grads_of(params, jax.tree.map(
                        lambda x: x[0], batch), sub, frozen)
                    return grads, loss
                def micro(carry, mb):
                    acc, key = carry
                    key, sub = jax.random.split(key)
                    loss, grads = micro_grads_of(params, mb, sub, frozen)
                    acc = jax.tree.map(lambda a, g: a + g / accum, acc, grads)
                    return (acc, key), loss
                zero = jax.tree.map(jnp.zeros_like, params)
                (grads, _), losses = jax.lax.scan(micro, (zero, key), batch)
                return grads, jnp.mean(losses)

            def micro_grads_of(params, mb, sub, frozen):
                if has_frozen:
                    return jax.value_and_grad(loss_fn)(params, mb, sub,
                                                       frozen)
                return jax.value_and_grad(loss_fn)(params, mb, sub)

            def update_step(params, opt_state, grads):
                updates, opt_state = self.optimizer.update(
                    grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state

            grad_jit = jax.jit(grad_step)
            update_jit = jax.jit(
                update_step,
                out_shardings=(self.param_sharding,
                               self.opt_sharding_device),
                donate_argnums=(0, 1, 2))

            def stepper(params, opt_state, batch, key, frozen=None):
                if has_frozen:
                    grads, loss = grad_jit(params, batch, key, frozen)
                else:
                    grads, loss = grad_jit(params, batch, key)
                opt_dev = jax.device_put(opt_state, self.opt_sharding_device)
                params, opt_state = update_jit(params, opt_dev, grads)
                opt_state = jax.device_put(opt_state, self.opt_sharding)
                return params, opt_state, loss

            # expose the phases for AOT memory analysis (the grad phase is
            # the activation-heavy peak; bench_train_step --memory-analysis)
            stepper.grad_jit = grad_jit
            stepper.update_jit = update_jit
            return stepper

        return jax.jit(
            train_step,
            out_shardings=(self.param_sharding, self.opt_sharding_device,
                           None),
            donate_argnums=self._donate)

    def load_state(self, params, opt_state):
        """Install restored state, re-placed onto this trainer's shardings.

        Orbax (absent explicit sharding args) rebuilds arrays from the
        sharding/layout metadata recorded in the checkpoint file ("Populating
        sharding info from sharding file"). Feeding such arrays straight into
        the donating compiled step lets XLA reuse buffers whose layout may
        not match the step's expected input layout — an intermittent runtime
        abort (SIGABRT) on resume. device_put onto the trainer's own
        NamedShardings yields freshly-placed arrays that are always safe to
        donate."""
        with self.mesh:
            self.params = jax.device_put(params, self.param_sharding)
            self.opt_state = jax.device_put(opt_state, self.opt_sharding)

    def run_step(self, batch, key, step_fn=None) -> float:
        """batch leaves shaped [grad_accum, micro_batch, ...]; micro_batch
        should be a multiple of mesh dp so samples shard across devices."""
        with self.mesh:
            fn = step_fn or self._train_step
            if self.frozen is not None:
                self.params, self.opt_state, loss = fn(
                    self.params, self.opt_state, batch, key, self.frozen)
            else:
                self.params, self.opt_state, loss = fn(
                    self.params, self.opt_state, batch, key)
        self.step += 1
        return float(loss)
