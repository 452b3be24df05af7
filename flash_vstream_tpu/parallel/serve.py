"""Disaggregated streaming serve: ingest on its own device(s), decode on the
rest of the slice.

The reference keeps 30 fps ingest alive while answering by dedicating a
second GPU to the frame memory manager (cuda:1) and the LLM to cuda:0
(Flash-VStream-Qwen/cli_server_2gpu.py:197-239), handing tensors across
processes through CPU shared memory. The TPU-native mapping runs in ONE
process on one slice:

- ingest device(s): vision tower weights + the Flash memory state (banks,
  CSM clusters) live there; the fused encode+consolidate jit executes there.
- decode devices: the decoder TP-sharded over the remaining chips (plus the
  patch merger, which runs at answer time); answer jits execute there.
- handover: the published memory snapshot (a few MB of spa/tem rows) is
  device_put ingest -> decode at answer time — an ICI hop instead of the
  reference's CPU round-trip through Manager.list (vstream_arch.py:694).

Both jits dispatch asynchronously from the host, so ingest clips and a long
answer EXECUTE CONCURRENTLY on their own chips — the property the reference
buys with a second GPU and two processes.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import jax

from .inference import shard_params_for_inference
from .sharding import create_mesh, replicated


class ServePlacement(NamedTuple):
    ingest_device: Any      # jax device holding vision tower + memory state
    decode_mesh: Any        # (1, tp) Mesh for the decoder + merger


def make_serve_placement(n_ingest: int = 1, n_decode: Optional[int] = None,
                         devices: Optional[Sequence] = None
                         ) -> ServePlacement:
    """Split the visible devices into [ingest | decode] contiguous groups.

    Contiguity keeps the snapshot handover and the TP collectives on
    nearest-neighbor ICI hops. n_ingest > 1 reserves spare ingest chips for
    multi-stream engines; the session itself pins to the first."""
    devices = list(devices if devices is not None else jax.devices())
    assert n_ingest >= 1, n_ingest
    assert len(devices) >= n_ingest + 1, (
        f"disaggregated serve needs >= {n_ingest + 1} devices, "
        f"have {len(devices)} (single-chip: use --preempt instead)")
    if n_decode is None:
        n_decode = len(devices) - n_ingest
    assert n_ingest + n_decode <= len(devices)
    decode = devices[n_ingest:n_ingest + n_decode]
    return ServePlacement(
        ingest_device=devices[0],
        decode_mesh=create_mesh(dp=1, tp=len(decode), devices=decode))


def place_qwen_serve_params(params: dict, placement: ServePlacement):
    """Split one Qwen param tree across the placement.

    Returns (ingest_params, decode_params): the full vision tower goes to the
    ingest device; the decode side gets the TP-sharded decoder plus the patch
    merger (answer-time splice runs there — see QwenStreamSession.ingest's
    merge-at-answer note)."""
    ingest_params = {
        "vit": jax.device_put(params["vit"], placement.ingest_device)}
    rep = replicated(placement.decode_mesh)
    merger = jax.device_put({"merger": params["vit"]["merger"]}, rep)
    llm, _ = shard_params_for_inference(params["llm"],
                                        mesh=placement.decode_mesh)
    return ingest_params, {"vit": merger, "llm": llm}
