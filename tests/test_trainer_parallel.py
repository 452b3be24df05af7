"""Sharded training tests on the virtual 8-device CPU mesh (dp x tp)."""
import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.core.config import LLMConfig
from flash_vstream_tpu.models.llm import (
    cross_entropy_loss,
    decoder_forward,
    embed_tokens,
    init_llm_params,
    lm_head,
)
from flash_vstream_tpu.parallel.sharding import (
    create_mesh,
    param_shardings,
    zero_shardings,
)
from flash_vstream_tpu.train.lora import init_lora_params, merge_lora
from flash_vstream_tpu.train.trainer import TrainConfig, Trainer

CFG = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                num_layers=2, num_heads=4, num_kv_heads=2)


def lm_loss(params, batch, key):
    ids, labels = batch["ids"], batch["labels"]
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1])[None], ids.shape)
    h, _ = decoder_forward(params, CFG, embed_tokens(params, ids), pos)
    return cross_entropy_loss(lm_head(params, CFG, h), labels)


def make_batch(rng, accum, bsz, seq):
    ids = rng.integers(0, 128, size=(accum, bsz, seq))
    return {"ids": jnp.asarray(ids), "labels": jnp.asarray(ids)}


def test_mesh_shapes():
    mesh = create_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}


def test_param_shardings_cover_tp():
    mesh = create_mesh(dp=4, tp=2)
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    sh = param_shardings(mesh, params)
    # qkv sharded over tp on the output dim
    assert sh["layers"]["attn"]["wq"]["w"].spec == jax.sharding.PartitionSpec(None, None, "tp")
    assert sh["layers"]["mlp"]["down"]["w"].spec == jax.sharding.PartitionSpec(None, "tp", None)
    assert sh["embed"].spec == jax.sharding.PartitionSpec("tp", None)
    assert sh["final_norm"].spec == jax.sharding.PartitionSpec()


def test_zero_shardings_use_dp():
    mesh = create_mesh(dp=4, tp=2)
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    zs = zero_shardings(mesh, params)
    spec = zs["layers"]["mlp"]["gate"]["w"].spec
    assert "dp" in spec and "tp" in spec


def test_training_loss_decreases(rng):
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    cfg = TrainConfig(learning_rate=1e-2, total_steps=20, grad_accum=2,
                      warmup_ratio=0.0)
    tr = Trainer(lm_loss, params, cfg, mesh=create_mesh(dp=4, tp=2))
    batch = make_batch(rng, 2, 4, 16)   # memorize one batch
    losses = [tr.run_step(batch, jax.random.PRNGKey(i)) for i in range(15)]
    assert losses[-1] < losses[0] * 0.8, losses
    # optimizer moments are actually dp-sharded
    mu = tr.opt_state.inner_states["train"].inner_state[1][0].mu
    spec = mu["layers"]["mlp"]["gate"]["w"].sharding.spec
    assert "dp" in spec


def test_batch_shards_over_dp(rng):
    """Real data parallelism: the per-step batch dim is constrained to the
    'dp' mesh axis inside the compiled step (not replicated)."""
    mesh = create_mesh(dp=4, tp=2)
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    observed = []

    def loss(params, batch, key):
        jax.debug.inspect_array_sharding(
            batch["ids"], callback=lambda s: observed.append(s))
        return lm_loss(params, batch, key)

    cfg = TrainConfig(learning_rate=1e-2, total_steps=4, grad_accum=2,
                      warmup_ratio=0.0)
    tr = Trainer(loss, params, cfg, mesh=mesh)
    tr.run_step(make_batch(rng, 2, 4, 16), jax.random.PRNGKey(0))
    assert observed, "sharding inspection did not run"
    # the microbatch [4, 16] ids shard their sample dim over dp
    assert any("dp" in str(s.spec) for s in observed), observed


def test_frozen_params_unchanged(rng):
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    cfg = TrainConfig(learning_rate=1e-2, total_steps=10,
                      trainable=(r"^lm_head$",), warmup_ratio=0.0)
    tr = Trainer(lm_loss, params, cfg, mesh=create_mesh(dp=8, tp=1),
                 donate_params=False)
    before = np.asarray(params["embed"])
    head_before = np.asarray(params["lm_head"])
    for i in range(2):   # step 0 is lr-warmup (lr=0)
        tr.run_step(make_batch(rng, 1, 4, 16), jax.random.PRNGKey(i))
    np.testing.assert_array_equal(np.asarray(tr.params["embed"]), before)
    assert not np.allclose(np.asarray(tr.params["lm_head"]), head_before)


def test_lora_views_match_merge(rng):
    """Merge-free LoRAWeight views compute the same forward as the
    materialized merge, and grads flow only through the rank-r factors."""
    from flash_vstream_tpu.train.lora import lora_views
    base = init_llm_params(jax.random.PRNGKey(0), CFG)
    lora = init_lora_params(jax.random.PRNGKey(1), base, rank=4)
    # b starts at zero; give it real values so the adapter actually acts
    lora = {k: {"a": v["a"],
                "b": jax.random.normal(jax.random.PRNGKey(2), v["b"].shape)
                * 0.05}
            for k, v in lora.items()}
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 16)))
    pos = jnp.broadcast_to(jnp.arange(16)[None], ids.shape)

    def fwd(params):
        h, _ = decoder_forward(params, CFG, embed_tokens(params, ids), pos)
        return lm_head(params, CFG, h)

    merged = fwd(merge_lora(base, lora, alpha=8, rank=4))
    viewed = fwd(lora_views(base, lora, alpha=8, rank=4))
    np.testing.assert_allclose(np.asarray(viewed), np.asarray(merged),
                               rtol=2e-4, atol=2e-4)

    def loss(lora_params):
        eff = lora_views(base, lora_params, alpha=8, rank=4)
        return jnp.sum(fwd(eff).astype(jnp.float32) ** 2) * 1e-6

    g = jax.grad(loss)(lora)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_qlora_int8_base(rng):
    """QLoRA: LoRA adapters over a weight-only int8 base (the reference's
    bnb 4/8-bit + peft combination). Views forward stays close to the
    dequantized-merge forward and adapter grads are finite and nonzero."""
    from flash_vstream_tpu.train.lora import lora_views
    from flash_vstream_tpu.weights.quantize import quantize_params
    base = init_llm_params(jax.random.PRNGKey(0), CFG)
    qbase = quantize_params(base)
    lora = init_lora_params(jax.random.PRNGKey(1), qbase, rank=4)
    assert "layers/attn/wq/w" in lora        # targets found through QuantWeight
    lora = {k: {"a": v["a"],
                "b": jax.random.normal(jax.random.PRNGKey(2), v["b"].shape)
                * 0.05}
            for k, v in lora.items()}
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 12)))
    pos = jnp.broadcast_to(jnp.arange(12)[None], ids.shape)

    def fwd(params):
        h, _ = decoder_forward(params, CFG, embed_tokens(params, ids), pos)
        return lm_head(params, CFG, h)

    viewed = fwd(lora_views(qbase, lora, alpha=8, rank=4))
    merged = fwd(merge_lora(qbase, lora, alpha=8, rank=4))
    np.testing.assert_allclose(np.asarray(viewed), np.asarray(merged),
                               rtol=5e-2, atol=5e-2)

    def loss(lora_params):
        eff = lora_views(qbase, lora_params, alpha=8, rank=4)
        return jnp.sum(fwd(eff).astype(jnp.float32) ** 2) * 1e-6

    g = jax.grad(loss)(lora)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_lora_training(rng):
    base = init_llm_params(jax.random.PRNGKey(0), CFG)
    lora = init_lora_params(jax.random.PRNGKey(1), base, rank=4)
    assert "layers/attn/wq/w" in lora

    def loss(lora_params, batch, key):
        eff = merge_lora(base, lora_params, alpha=8, rank=4)
        return lm_loss(eff, batch, key)

    cfg = TrainConfig(learning_rate=1e-2, total_steps=20, warmup_ratio=0.0)
    tr = Trainer(loss, lora, cfg, mesh=create_mesh(dp=8, tp=1))
    batch = make_batch(rng, 1, 4, 16)
    losses = [tr.run_step(batch, jax.random.PRNGKey(i)) for i in range(10)]
    assert losses[-1] < losses[0]
    # b starts at zero and moves
    assert float(jnp.abs(tr.params["layers/attn/wq/w"]["b"]).max()) > 0


def test_zero3_fsdp_params_sharded_and_loss_matches():
    """ZeRO stage 3 (reference scripts/zero3.json): params themselves shard
    over 'dp'; the loss trajectory matches the stage-2 trainer bit-for-bit
    since sharding only changes layout, not math."""
    rng = np.random.default_rng(0)
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    mesh = create_mesh(dp=4, tp=2)
    batches = [make_batch(rng, 2, 4, 16) for _ in range(2)]

    losses = {}
    for stage in (2, 3):
        cfg = TrainConfig(learning_rate=1e-3, total_steps=4, grad_accum=2,
                          zero_stage=stage)
        tr = Trainer(lm_loss, jax.tree.map(jnp.copy, params), cfg, mesh=mesh)
        if stage == 3:
            spec = tr.param_sharding["layers"]["mlp"]["gate"]["w"].spec
            assert "dp" in spec, spec
            # per-device shard is 1/dp of the stage-2 (replicated) footprint
            w = tr.params["layers"]["mlp"]["gate"]["w"]
            shard_elems = np.prod(w.addressable_shards[0].data.shape)
            assert shard_elems * mesh.shape["dp"] * mesh.shape["tp"] \
                <= w.size * mesh.shape["tp"]
        else:
            assert "dp" not in (
                tr.param_sharding["layers"]["mlp"]["gate"]["w"].spec or ())
        losses[stage] = [tr.run_step(b, jax.random.PRNGKey(7))
                        for b in batches]
    np.testing.assert_allclose(losses[3], losses[2], rtol=1e-5)


def test_zero3_fsdp_frozen_tree_sharded():
    """Stage 3 also shards a frozen (LoRA-base-style) tree over dp."""
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    frozen = init_llm_params(jax.random.PRNGKey(1), CFG)

    def loss_with_frozen(p, batch, key, fz):
        return lm_loss(p, batch, key) + 0.0 * jnp.sum(
            fz["layers"]["mlp"]["gate"]["w"][0, 0, :1])

    mesh = create_mesh(dp=4, tp=2)
    cfg = TrainConfig(learning_rate=1e-3, total_steps=2, grad_accum=1,
                      zero_stage=3)
    tr = Trainer(loss_with_frozen, params, cfg, mesh=mesh, frozen=frozen)
    assert "dp" in tr.frozen["layers"]["mlp"]["gate"]["w"].sharding.spec
    rng = np.random.default_rng(0)
    loss = tr.run_step(make_batch(rng, 1, 4, 16), jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_offload_moments_matches_resident(rng):
    """--offload-moments (zero*_offload parity): moments rest in the host
    memory kind between steps and the training trajectory is identical to
    the HBM-resident trainer (on the CPU mesh host kind == device kind, so
    this pins the round-trip plumbing, shardings, and donation)."""
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    batch = make_batch(np.random.default_rng(0), 2, 4, 16)

    def run(offload):
        cfg = TrainConfig(learning_rate=1e-2, total_steps=20, grad_accum=2,
                          warmup_ratio=0.0, offload_moments=offload)
        tr = Trainer(lm_loss, params, cfg, mesh=create_mesh(dp=4, tp=2))
        losses = [tr.run_step(batch, jax.random.PRNGKey(i)) for i in range(5)]
        return tr, losses

    tr_res, losses_res = run(False)
    tr_off, losses_off = run(True)
    np.testing.assert_allclose(losses_off, losses_res, rtol=1e-6)
    assert losses_off[-1] < losses_off[0]

    # the resting moments carry the selected host memory kind
    assert tr_off._host_kind is not None
    mu = tr_off.opt_state.inner_states["train"].inner_state[1][0].mu
    kind = mu["layers"]["mlp"]["gate"]["w"].sharding.memory_kind
    assert kind in (tr_off._host_kind, None)
