"""Reference A/B runner: drives the ACTUAL PyTorch reference implementation
(`/root/reference`, imported at runtime — nothing is copied) on tiny synthetic
data with caller-provided weights and batches, returning per-step losses and
final parameters. `tests/test_reference_parity.py` feeds the identical
init/batches to our JAX engine and asserts trajectory agreement.

Covered reference paths (dlrm_s_pytorch_comm_grad.py):
- FP32 model + plain SGD                  (DLRM_Net, quantization_flag=False)
- emb-only INT4 QAT + plain SGD           (QuantEmbeddingBagTwo pooled-output
                                           fake-quant; QuantLinear in
                                           full-precision mode)
- full INT4 QAT (emb + MLP weights, bias_bit=weight_bit) + plain SGD
- full INT4 + INT8 integer-activation chains ("act4": quantize_activation,
  QuantAct running-extremum ranges + ste_round integer MLPs,
  comm_grad.py:863-879 / quant_modules_not_quantize_grad.py:104-214)
- full INT4 QAT + quantized-gradient communication at world_size=1
  (clear_gradients -> backward -> grad_update_parallel_comm ->
   weight_update_parallel_comm, sgd_quantized_gradients_parallel_comm.py)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from typing import Dict, List, Sequence

import numpy as np

REFERENCE_DIR = "/root/reference"


def have_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


_ref_mod = None


def _import_reference():
    """Import the reference driver module once, with CPU-torch shims."""
    global _ref_mod
    if _ref_mod is not None:
        return _ref_mod
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import torch

    if not torch.cuda.is_available():
        # The reference hardcodes `.cuda()` on the quantization zero-point
        # (quant_utils.py:337) even on CPU paths; neutralize it for the
        # CPU-only torch build. Test-process-local monkeypatch.
        torch.Tensor.cuda = lambda self, *a, **k: self
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        import dlrm_s_pytorch_comm_grad as ref  # noqa: F401
    _ref_mod = ref
    return ref


def _build_model(
    ref,
    weights: Dict,
    mode: str,
    embedding_bit: int,
    weight_bit: int,
    loss_function: str = "bce",
):
    import torch

    table_sizes = [w.shape[0] for w in weights["emb"]]
    m_spa = weights["emb"][0].shape[1]
    ln_bot = np.array(
        [weights["bot"][0]["w"].shape[1]]
        + [l["w"].shape[0] for l in weights["bot"]]
    )
    ln_top = np.array(
        [weights["top"][0]["w"].shape[1]]
        + [l["w"].shape[0] for l in weights["top"]]
    )
    quantized = mode != "fp32"
    with contextlib.redirect_stdout(io.StringIO()):
        model = ref.DLRM_Net(
            m_spa,
            np.array(table_sizes),
            ln_bot,
            ln_top,
            arch_interaction_op="dot",
            sigmoid_bot=-1,
            sigmoid_top=ln_top.size - 2,
            quantization_flag=quantized,
            embedding_bit=embedding_bit,
            weight_bit=weight_bit,
            quantize_act_and_lin=(mode in ("full4", "act4", "commgrad")),
            quantize_activation=(mode == "act4"),
            loss_function=loss_function,
        )
    # epoch-schedule globals of the driver (train() sets these from args;
    # we pin them to the steady quantized phase)
    ref.full_precision_flag = False
    ref.change_bitw = False
    ref.change_lin_full_quantize = False

    # overwrite every parameter with the caller's init
    with torch.no_grad():
        for k, w in enumerate(weights["emb"]):
            if quantized:
                model.emb_l[k].embedding_bag.weight.data = torch.tensor(w)
            else:
                model.emb_l[k].weight.data = torch.tensor(w)
        for part, layers in (("bot", model.bot_l), ("top", model.top_l)):
            li = 0
            for layer in layers:
                if hasattr(layer, "weight"):
                    layer.weight.data = torch.tensor(weights[part][li]["w"])
                    layer.bias.data = torch.tensor(weights[part][li]["b"])
                    li += 1
    return model


def _extract_params(model, quantized: bool) -> Dict:
    out = {"emb": [], "bot": [], "top": []}
    for e in model.emb_l:
        w = e.embedding_bag.weight if quantized else e.weight
        out["emb"].append(w.detach().numpy().copy())
    for part, layers in (("bot", model.bot_l), ("top", model.top_l)):
        for layer in layers:
            if hasattr(layer, "weight"):
                out[part].append(
                    {
                        "w": layer.weight.detach().numpy().copy(),
                        "b": layer.bias.detach().numpy().copy(),
                    }
                )
    return out


def run_reference(
    weights: Dict,
    batches: Sequence[Dict],
    lr: float,
    mode: str = "fp32",
    embedding_bit: int = 4,
    weight_bit: int = 4,
    grad_bits: int = 8,
    optimizer: str = "sgd",
    lr_schedule=None,
    loss_function: str = "bce",
    loss_weights=(1.0, 1.0),
    grad_accum: int = 1,
) -> Dict:
    """Train the reference model and return its trajectory.

    weights: {"emb": [np [n,D]], "bot"/"top": [{"w","b"}]} (our init layout;
      torch Linear uses the same [out,in] weight shape).
    batches: [{"dense" [B,nd] f32, "indices" [T,B] int64, "labels" [B] f32}].
    mode: fp32 | emb4 | full4 | act4 | commgrad.
    optimizer: sgd | adagrad | rwsadagrad (dlrm_s_pytorch.py:1330-1334);
      only meaningful outside commgrad mode (which uses the manual update).
    lr_schedule: optional (num_warmup_steps, decay_start_step,
      num_decay_steps) driving the reference LRPolicyScheduler
      (dlrm_s_pytorch.py:160-194), stepped once per iteration like the
      driver loop (:1602-1603).
    Returns {"losses": [float], "probs_last": np [B], "params": final}.
    """
    ref = _import_reference()
    import torch

    torch.manual_seed(0)
    quantized = mode != "fp32"
    if loss_function == "wbce":
        # the ctor's wbce branch reads the module-global `args.loss_weights`
        # (comm_grad.py:539-543)
        import types

        ref.args = types.SimpleNamespace(
            loss_weights="-".join(str(w) for w in loss_weights)
        )
    model = _build_model(
        ref, weights, mode, embedding_bit, weight_bit, loss_function
    )

    use_commgrad = mode == "commgrad"
    if use_commgrad:
        import torch.distributed as dist

        from sgd_quantized_gradients_parallel_comm import (  # noqa: E501
            clear_gradients,
            grad_update_parallel_comm,
            weight_update_parallel_comm,
        )

        if not dist.is_initialized():
            dist.init_process_group(
                "gloo",
                init_method="tcp://127.0.0.1:29781",
                world_size=1,
                rank=0,
            )
    else:
        if optimizer == "sgd":
            opt = torch.optim.SGD(model.parameters(), lr=lr)
        elif optimizer == "adagrad":
            opt = torch.optim.Adagrad(model.parameters(), lr=lr)
        elif optimizer == "rwsadagrad":
            from optim.rwsadagrad import RWSAdagrad

            # RWSAdagrad's row-wise path requires sparse embedding grads:
            # the canonical rwsadagrad driver builds its bags sparse=True
            # (dlrm_s_pytorch.py:268); the comm_grad model this harness
            # uses has sparse=False, so flip the flag (read at backward
            # time) to get the canonical semantics.
            if mode == "fp32":
                for e in model.emb_l:
                    e.sparse = True
            opt = RWSAdagrad(model.parameters(), lr=lr)
        else:
            raise ValueError(f"unknown optimizer {optimizer!r}")
        scheduler = None
        if lr_schedule is not None:
            warm, dstart, dsteps = lr_schedule
            scheduler = ref.LRPolicyScheduler(opt, warm, dstart, dsteps)

    losses: List[float] = []
    probs = None
    for j, b in enumerate(batches):
        dense = torch.tensor(b["dense"])
        lS_i = [torch.tensor(b["indices"][k]) for k in range(len(b["indices"]))]
        lS_o = [torch.arange(dense.shape[0]) for _ in lS_i]
        labels = torch.tensor(b["labels"]).view(-1, 1)
        with contextlib.redirect_stdout(io.StringIO()):
            Z = model(dense, lS_o, lS_i)
        if loss_function == "wbce":
            # loss_fn_wrap semantics (dlrm_s_pytorch.py:144-152)
            w = model.loss_ws[labels.view(-1).long()].view_as(labels).float()
            E = (w * model.loss_fn(Z, labels)).mean()
        else:
            E = model.loss_fn(Z, labels)
        losses.append(float(E.detach()))
        probs = Z.detach().numpy().reshape(-1).copy()
        if use_commgrad:
            with contextlib.redirect_stdout(io.StringIO()):
                clear_gradients(model)
                E.backward()
                grad_update_parallel_comm(
                    model,
                    1,
                    emb_grad_quantized=True,
                    num_bits=grad_bits,
                    ranking_range=False,
                )
                weight_update_parallel_comm(
                    model,
                    lr,
                    emb_grad_quantized=True,
                    update_embedding=True,
                    num_gpus=1,
                )
        else:
            # --mlperf-grad-accum-iter semantics (dlrm_s_pytorch.py:
            # 1595-1604): zero_grad AND step share the SAME (j+1)%k==0
            # condition, so the zero_grad right before the step-iteration's
            # backward DISCARDS the grads accumulated over the previous k-1
            # batches — the applied update is the k-th batch's own mean
            # gradient only. grad_accum=1 reproduces the plain loop.
            do_step = ((j + 1) % grad_accum) == 0
            if do_step:
                opt.zero_grad()
            E.backward()
            if do_step:
                opt.step()
                if scheduler is not None:
                    scheduler.step()
    return {
        "losses": losses,
        "probs_last": probs,
        "params": _extract_params(model, quantized),
    }


def run_reference_epochs(
    weights: Dict,
    epochs: Sequence[Sequence[Dict]],
    lr: float,
    embedding_bit: int = 4,
    weight_bit: int = 4,
) -> Dict:
    """Drive the reference QAT EPOCH SCHEDULE end-to-end
    (dlrm_s_pytorch_comm_grad.py:1849-1872):

      epoch 0: full_precision_flag=True  (FP pretrain — emb unquantized,
               QuantLinear constructed full-precision)
      epoch 1: full_precision_flag=False (emb pooled-output INT4 on)
      epoch 2: change_lin_full_quantize  (QuantLinear flips to quantized
               mid-training, :811-815 + :583)
      epoch 3: change_bitw -> change_bitw2 bits (weight/bias bit shift,
               :576-581), change_bitw2 = 8 here

    plain SGD stepping. epochs: list of per-epoch batch lists.
    """
    ref = _import_reference()
    import torch

    torch.manual_seed(0)
    # quantize_act_and_lin=False: QuantLinear starts full-precision (the
    # delayed-MLP flow), flipped later by change_lin_full_quantize
    model = _build_model(ref, weights, "emb4", embedding_bit, weight_bit)
    opt = torch.optim.SGD(model.parameters(), lr=lr)

    losses: List[float] = []
    for k, ep_batches in enumerate(epochs):
        ref.full_precision_flag = k < 1
        if k == 2:
            ref.change_lin_full_quantize = True
        if k == 3:
            ref.change_bitw = True
            ref.change_bitw2 = 8
        for b in ep_batches:
            dense = torch.tensor(b["dense"])
            lS_i = [torch.tensor(b["indices"][j]) for j in range(len(b["indices"]))]
            lS_o = [torch.arange(dense.shape[0]) for _ in lS_i]
            labels = torch.tensor(b["labels"]).view(-1, 1)
            with contextlib.redirect_stdout(io.StringIO()):
                Z = model(dense, lS_o, lS_i)
            E = model.loss_fn(Z, labels)
            losses.append(float(E.detach()))
            opt.zero_grad()
            E.backward()
            opt.step()
    ref.change_bitw = False
    ref.change_lin_full_quantize = False
    return {
        "losses": losses,
        "params": _extract_params(model, quantized=True),
    }


_ref_pseudo_mod = None


def _import_reference_pseudo():
    """Import the reference pseudo-multigpu driver module once."""
    global _ref_pseudo_mod
    if _ref_pseudo_mod is not None:
        return _ref_pseudo_mod
    _import_reference()  # sys.path + torch CPU shims
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        import dlrm_s_pytorch_pseudo_multigpu as refp  # noqa: F401
    _ref_pseudo_mod = refp
    return refp


def run_reference_pseudo(
    weights: Dict,
    micro_batches: Sequence[Dict],
    lr: float,
    num_workers: int,
    weight_bit: int = 4,
) -> Dict:
    """Drive the reference pseudo-multi-GPU path on caller-provided data.

    Runs the ACTUAL dlrm_s_pytorch_pseudo_multigpu.DLRM_Net (QuantLinear MLPs
    from quant_modules.py, FP embeddings — the module-level
    full_precision_flag stays False so QuantEmbeddingBagTwo returns raw
    pooled output, quant_modules.py:335-344 inverted convention) through the
    ACTUAL sgd_quantized_gradients buffer algorithm:
    clear_gradients -> backward -> grad_buffer_update_added_quantization
    (INT8, EC, per-channel weight scales) each micro-step; every
    `num_workers` micro-steps weights_update_added_quantization +
    grad_buffer_zeroing.

    Round boundary normalized: the driver's `j % N == 0` check
    (dlrm_s_pytorch_pseudo_multigpu.py:1625) makes its FIRST round a single
    micro-batch (off-by-one research quirk); we apply after every N
    micro-batches — the algorithm as the paper describes it and as
    parallel/pseudo.py implements it.

    micro_batches: flat list, length divisible by num_workers; each of size
    mb (the per-worker slice).
    """
    refp = _import_reference_pseudo()
    import torch

    from sgd_quantized_gradients import (  # noqa: E501
        clear_gradients,
        grad_buffer_update_added_quantization,
        grad_buffer_zeroing,
        weights_update_added_quantization,
    )

    torch.manual_seed(0)
    table_sizes = [w.shape[0] for w in weights["emb"]]
    m_spa = weights["emb"][0].shape[1]
    ln_bot = np.array(
        [weights["bot"][0]["w"].shape[1]] + [l["w"].shape[0] for l in weights["bot"]]
    )
    ln_top = np.array(
        [weights["top"][0]["w"].shape[1]] + [l["w"].shape[0] for l in weights["top"]]
    )
    with contextlib.redirect_stdout(io.StringIO()):
        model = refp.DLRM_Net(
            m_spa,
            np.array(table_sizes),
            ln_bot,
            ln_top,
            arch_interaction_op="dot",
            sigmoid_bot=-1,
            sigmoid_top=ln_top.size - 2,
            quantization_flag=True,
            embedding_bit=32,
            weight_bit=weight_bit,
            quantize_act_and_lin=True,  # QuantLinear MLPs (create_mlp :421-426)
            quantize_activation=False,
        )
    # module-level schedule flags: emb stays RAW (inverted convention),
    # no epoch transitions
    refp.full_precision_flag = False
    refp.change_bitw = False
    refp.change_lin_full_quantize = False

    with torch.no_grad():
        for k, w in enumerate(weights["emb"]):
            model.emb_l[k].embedding_bag.weight.data = torch.tensor(w)
        for part, layers in (("bot", model.bot_l), ("top", model.top_l)):
            li = 0
            for layer in layers:
                if hasattr(layer, "weight"):
                    layer.weight.data = torch.tensor(weights[part][li]["w"])
                    layer.bias.data = torch.tensor(weights[part][li]["b"])
                    li += 1

    losses: List[float] = []
    buffer_clean = True
    for j, b in enumerate(micro_batches):
        dense = torch.tensor(b["dense"])
        lS_i = [torch.tensor(b["indices"][k]) for k in range(len(b["indices"]))]
        lS_o = [torch.arange(dense.shape[0]) for _ in lS_i]
        labels = torch.tensor(b["labels"]).view(-1, 1)
        with contextlib.redirect_stdout(io.StringIO()):
            Z = model(dense, lS_o, lS_i)
            E = model.loss_fn(Z, labels)
            losses.append(float(E.detach()))
            clear_gradients(model)
            if buffer_clean:
                grad_buffer_zeroing(model)
                buffer_clean = False
            E.backward()
            grad_buffer_update_added_quantization(
                model, num_workers, emb_grad_quantized=True
            )
            if (j + 1) % num_workers == 0:
                weights_update_added_quantization(
                    model, lr, num_workers,
                    emb_grad_quantized=True, update_embedding=True,
                )
                buffer_clean = True
    return {
        "losses": losses,
        "params": _extract_params(model, quantized=True),
    }


_ref_up_mod = None


def _import_reference_upstream():
    """Import the UPSTREAM baseline driver (dlrm_s_pytorch.py) — the only
    reference module with QR/MD embedding support (create_emb dispatch,
    dlrm_s_pytorch.py:239-286)."""
    global _ref_up_mod
    if _ref_up_mod is not None:
        return _ref_up_mod
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import torch

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        import dlrm_s_pytorch as up  # noqa: F401
    _ref_up_mod = up
    return up


def run_reference_tricks(
    weights: Dict,
    table_sizes: Sequence[int],
    batches: Sequence[Dict],
    lr: float,
    kind: str = "qr",
    qr_collisions: int = 4,
    qr_operation: str = "mult",
    threshold: int = 200,
    md_dims: Sequence[int] = None,
    weighted_pooling: str = None,
    v_W: Sequence[np.ndarray] = None,
) -> Dict:
    """FP32 QR/MD (or kind="dense" plain) full-model trajectory via the
    upstream DLRM_Net. `weighted_pooling` ("fixed"/"learned") exercises the
    per_sample_weights path (dlrm_s_pytorch.py:417-448); `v_W` optionally
    seeds the pooling weights (upstream inits them to ones).

    weights["emb"][k] is a dict ({"q","r"} or {"table"[,"proj"]}) for
    tables above `threshold`, else a dense [n, D] array — our init_params
    layout. batches carry "indices" [T, B, P] (P>=1; flattened to the
    reference's offsets form with uniform bag size P).
    """
    up = _import_reference_upstream()
    import torch

    torch.manual_seed(0)
    D = weights["bot"][-1]["w"].shape[0]
    ln_bot = np.array(
        [weights["bot"][0]["w"].shape[1]]
        + [l["w"].shape[0] for l in weights["bot"]]
    )
    ln_top = np.array(
        [weights["top"][0]["w"].shape[1]]
        + [l["w"].shape[0] for l in weights["top"]]
    )
    m_spa = np.array(md_dims) if kind == "md" else D
    with contextlib.redirect_stdout(io.StringIO()):
        model = up.DLRM_Net(
            m_spa,
            np.array(list(table_sizes)),
            ln_bot,
            ln_top,
            arch_interaction_op="dot",
            sigmoid_bot=-1,
            sigmoid_top=ln_top.size - 2,
            qr_flag=(kind == "qr"),
            qr_operation=qr_operation,
            qr_collisions=qr_collisions,
            qr_threshold=threshold,
            md_flag=(kind == "md"),
            md_threshold=threshold,
            weighted_pooling=weighted_pooling,
            loss_function="bce",
        )
    with torch.no_grad():
        for k, w in enumerate(weights["emb"]):
            e = model.emb_l[k]
            if isinstance(w, dict) and "q" in w:
                e.weight_q.data = torch.tensor(np.asarray(w["q"]))
                e.weight_r.data = torch.tensor(np.asarray(w["r"]))
            elif isinstance(w, dict):
                e.embs.weight.data = torch.tensor(np.asarray(w["table"]))
                if "proj" in w:
                    e.proj.weight.data = torch.tensor(np.asarray(w["proj"]))
            else:
                e.weight.data = torch.tensor(np.asarray(w))
        if v_W is not None:
            for k, v in enumerate(v_W):
                if model.weighted_pooling == "learned":
                    model.v_W_l[k].data = torch.tensor(np.asarray(v))
                else:
                    model.v_W_l[k] = torch.tensor(np.asarray(v))
        for part, layers in (("bot", model.bot_l), ("top", model.top_l)):
            li = 0
            for layer in layers:
                if hasattr(layer, "weight"):
                    layer.weight.data = torch.tensor(weights[part][li]["w"])
                    layer.bias.data = torch.tensor(weights[part][li]["b"])
                    li += 1

    opt = torch.optim.SGD(model.parameters(), lr=lr)
    losses: List[float] = []
    probs = None
    for b in batches:
        dense = torch.tensor(b["dense"])
        idx = np.asarray(b["indices"])  # [T, B, P]
        T_, B_, P_ = idx.shape
        lS_i = [torch.tensor(idx[t].reshape(-1).astype(np.int64)) for t in range(T_)]
        lS_o = [torch.tensor(np.arange(B_, dtype=np.int64) * P_) for _ in range(T_)]
        labels = torch.tensor(b["labels"]).reshape(-1, 1)
        Z = model(dense, lS_o, lS_i)
        E = model.loss_fn(Z, labels)
        losses.append(float(E.detach()))
        opt.zero_grad()
        E.backward()
        opt.step()
        probs = Z.detach().numpy().reshape(-1).copy()

    out = {"emb": [], "bot": [], "top": []}
    if weighted_pooling is not None:
        out["v_W"] = [v.detach().numpy().copy() for v in model.v_W_l]
    for e in model.emb_l:
        if hasattr(e, "weight_q"):
            out["emb"].append({
                "q": e.weight_q.detach().numpy().copy(),
                "r": e.weight_r.detach().numpy().copy(),
            })
        elif hasattr(e, "embs"):
            entry = {"table": e.embs.weight.detach().numpy().copy()}
            if hasattr(e.proj, "weight"):
                entry["proj"] = e.proj.weight.detach().numpy().copy()
            out["emb"].append(entry)
        else:
            out["emb"].append(e.weight.detach().numpy().copy())
    for part, layers in (("bot", model.bot_l), ("top", model.top_l)):
        for layer in layers:
            if hasattr(layer, "weight"):
                out[part].append({
                    "w": layer.weight.detach().numpy().copy(),
                    "b": layer.bias.detach().numpy().copy(),
                })
    return {"losses": losses, "probs_last": probs, "params": out}
