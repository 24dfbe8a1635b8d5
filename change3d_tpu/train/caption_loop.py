"""Change-captioning training + autoregressive evaluation.

Replicates the reference protocol (ref: /root/reference/scripts/train_CC.py):

- teacher-forced CE (ignore 0) with grad value clip +-5 and two Adams
  (encoder 1e-4, wd 1e-5 when fine-tuning; decoder 1e-4, wd 1e-5)
  (ref: train_CC.py:439-455) — expressed as a single optax transform with a
  per-subtree learning-rate mask;
- lr x0.5 every 10 epochs (ref: train_CC.py:489-491);
- eval decodes one item per image (every 5th caption row, train_CC.py:213),
  beam search (fixed-shape scan here, k=beam_size), strips
  <start>/<end>/<pad>, splits change/no-change by the canned no-change
  sentences (train_CC.py:346-376), and scores BLEU/METEOR/ROUGE/CIDEr;
- best model gated on BLEU-4 (train_CC.py:517-532).

TPU-native deltas: evaluation is *batched* (the reference decodes with
batch=1) and the whole decode loop is one jitted scan.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from change3d_tpu.checkpoint.convert import load_x3d_pretrained, merge_backbone_variables
from change3d_tpu.checkpoint.orbax_io import CheckpointManager
from change3d_tpu.data.datasets import CaptionDataset
from change3d_tpu.data.pipeline import (
    DataLoader,
    caption_collate,
    device_prefetch,
    iter_from as data_iter_from,
    make_data_loader,
)
from change3d_tpu.models.caption_decoder import MAX_CAPTION_LEN, beam_search_decode
from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    multiple_of_devices,
)
from change3d_tpu.train.engine import create_train_state, make_train_step
from change3d_tpu.train.loop import PreemptionGuard
from change3d_tpu.train.lr import shrink_schedule
from change3d_tpu.train.optim import torch_adam
from change3d_tpu.metrics.caption import eval_caption_scores
from change3d_tpu.utils.logging import setup_logger
from change3d_tpu.utils.profiling import WindowTracer

NOCHANGE_SENTENCES = [
    "the scene is the same as before",
    "there is no difference",
    "the two scenes seem identical",
    "no change has occurred",
    "almost nothing has changed",
]


@dataclasses.dataclass
class CaptionRunConfig:
    file_root: str
    dataset: str = "LEVIR_CC_5_cap_per_img_5_min_word_freq"
    word_map: Optional[str] = None
    save_dir: str = "./exp"
    epochs: int = 200
    batch_size: int = 32
    eval_batch_size: int = 32
    lr: float = 1e-4  # decoder lr (ref --decoder_lr)
    encoder_lr: Optional[float] = None  # ref --encoder_lr; None -> same as lr
    weight_decay: float = 1e-5
    grad_clip: float = 5.0
    embed_dim: int = 192
    n_head: int = 8
    n_layer: int = 3
    dropout: float = 0.1
    beam_size: int = 1
    num_workers: int = 2
    seed: int = 16
    pretrained: Optional[str] = None
    resume: bool = False
    eval_split: str = "TEST"
    fine_tune_encoder: bool = True  # ref: train_CC.py:645 (False freezes the encoder)
    compute_dtype: str = "float32"  # 'bfloat16' -> bf16 activations in the train step
    loader: str = "threaded"  # or 'grain'
    profile_dir: Optional[str] = None  # jax.profiler trace of steps 10-14


def load_word_map(cfg: CaptionRunConfig) -> Dict[str, int]:
    path = cfg.word_map or os.path.join(cfg.file_root, f"WORDMAP_{cfg.dataset}.json")
    with open(path) as f:
        return json.load(f)


def build_caption_model(
    cfg: CaptionRunConfig, vocab_size: int, in_size: int = 256, backbone_cfg=None
) -> Change3D:
    """``backbone_cfg`` overrides the default X3D-L (e.g. quantized_eval /
    packed_eval_stages for serving); None keeps reference-exact execution."""
    return Change3D(
        task=Task.CC,
        vocab_size=vocab_size,
        embed_dim=cfg.embed_dim,
        num_heads=cfg.n_head,
        num_layers=cfg.n_layer,
        dropout=cfg.dropout,
        in_height=in_size,
        in_width=in_size,
        backbone_cfg=backbone_cfg,
    )


def make_decode_fn(model: Change3D, beam_size: int, word_map: Dict[str, int]):
    """Jittable batched beam decode: (variables, pre, post) -> tokens.
    Uses the KV-cached incremental path (O(L) attention; equality-tested
    against full-prefix re-decode)."""
    from change3d_tpu.models.caption_decoder import make_incremental_fns

    incremental = make_incremental_fns(model)

    def decode(variables, pre, post):
        out = model.apply(variables, pre, post, train=False)
        memory = out["memory"]

        def apply_tokens(vs, tokens, mem):
            return model.apply(vs, tokens, mem, method=model.decode_captions)

        tokens, scores = beam_search_decode(
            apply_tokens,
            variables,
            memory,
            beam_size=beam_size,
            start_token=word_map["<start>"],
            end_token=word_map["<end>"],
            pad_token=word_map.get("<pad>", 0),
            max_len=MAX_CAPTION_LEN,
            incremental=incremental,
        )
        return tokens, scores

    return jax.jit(decode)


def save_caption_json(save_dir: str, word_map: Dict[str, int], hypotheses, references) -> None:
    """Persist res.json / gts.json in the reference's format (word-id lists
    rendered to text; ref: /root/reference/scripts/train_CC.py:34-73)."""
    rev = {v: k for k, v in word_map.items()}
    os.makedirs(save_dir, exist_ok=True)
    res = [
        {"image_id": i, "caption": " ".join(rev.get(w, "?") for w in hyp)}
        for i, hyp in enumerate(hypotheses)
    ]
    gts = [
        {"image_id": i, "captions": [" ".join(rev.get(w, "?") for w in r) for r in refs]}
        for i, refs in enumerate(references)
    ]
    with open(os.path.join(save_dir, "res.json"), "w") as f:
        json.dump(res, f)
    with open(os.path.join(save_dir, "gts.json"), "w") as f:
        json.dump(gts, f)


def _allgather_caption_results(hypotheses, references):
    """Reconstruct the full eval set on every host (multi-host CC eval).

    Each process decodes only its slice of every global batch (loader
    process-sharding, data/pipeline.py); token lists are padded into fixed
    int32 arrays, ``process_allgather``ed, and unpacked in process order, so
    every host scores the identical global set — the per-epoch BLEU-4 best
    gate (and the collective orbax save it triggers) then agrees across
    hosts. Corpus metrics are order-insensitive, so the process-major
    ordering does not affect scores."""
    from jax.experimental import multihost_utils

    n = len(hypotheses)
    cpi = max((len(r) for r in references), default=0)
    maxlen = max(
        [len(h) for h in hypotheses]
        + [len(t) for refs in references for t in refs]
        + [1]
    )
    dims = np.asarray(
        multihost_utils.process_allgather(np.array([n, cpi, maxlen], np.int32))
    ).reshape(-1, 3)
    n_max = int(dims[:, 0].max())
    cpi_max = int(dims[:, 1].max())
    L = int(dims[:, 2].max())

    hyp = np.full((n_max, L), -1, np.int32)
    hyp_len = np.zeros((n_max,), np.int32)
    ref = np.full((n_max, cpi_max, L), -1, np.int32)
    ref_cnt = np.zeros((n_max,), np.int32)
    for i, h in enumerate(hypotheses):
        hyp_len[i] = len(h)
        hyp[i, : len(h)] = h
    for i, refs in enumerate(references):
        ref_cnt[i] = len(refs)
        for j, t in enumerate(refs):
            ref[i, j, : len(t)] = t

    g_hyp = np.asarray(multihost_utils.process_allgather(hyp))
    g_len = np.asarray(multihost_utils.process_allgather(hyp_len))
    g_ref = np.asarray(multihost_utils.process_allgather(ref))
    g_cnt = np.asarray(multihost_utils.process_allgather(ref_cnt))

    all_h, all_r = [], []
    for p in range(dims.shape[0]):
        for i in range(int(dims[p, 0])):
            all_h.append([int(t) for t in g_hyp[p, i, : g_len[p, i]]])
            all_r.append(
                [[int(t) for t in row[row >= 0]] for row in g_ref[p, i, : g_cnt[p, i]]]
            )
    return all_h, all_r


def evaluate_captions(
    model: Change3D,
    variables,
    loader: DataLoader,
    word_map: Dict[str, int],
    beam_size: int = 1,
    save_dir: Optional[str] = None,
    decode_fn=None,
) -> Dict[str, float]:
    """Batched beam-search eval + caption metric suite + change/no-change split.

    Pass ``decode_fn`` (one ``make_decode_fn`` result per run) when calling
    every epoch — building it here would re-trace the 52-step beam scan each
    call (the persistent XLA cache hides compile time, not tracing time).
    """
    rev = {v: k for k, v in word_map.items()}
    special = {word_map["<start>"], word_map["<end>"], word_map.get("<pad>", 0)}
    decode = decode_fn or make_decode_fn(model, beam_size, word_map)

    references: List[List[List[int]]] = []
    hypotheses: List[List[int]] = []
    for batch in loader:
        valid = batch.pop("valid", np.ones(len(batch["pre"]), bool))
        tokens, _ = decode(variables, jnp.asarray(batch["pre"]), jnp.asarray(batch["post"]))
        tokens = np.asarray(tokens)
        for i in range(len(tokens)):
            if not valid[i]:
                continue
            hyp = [int(t) for t in tokens[i] if int(t) not in special]
            refs = [
                [int(t) for t in cap if int(t) not in special]
                for cap in batch["all_captions"][i]
            ]
            hypotheses.append(hyp)
            references.append(refs)

    if jax.process_count() > 1:
        hypotheses, references = _allgather_caption_results(hypotheses, references)

    if save_dir and jax.process_index() == 0:
        save_caption_json(save_dir, word_map, hypotheses, references)
    scores = eval_caption_scores(references, hypotheses)

    # Change / no-change split accuracy (ref: train_CC.py:346-376; the canned
    # sentences carry a trailing space there — compare on stripped text).
    def text(ids):
        return " ".join(rev.get(i, "?") for i in ids).strip()

    ch_acc = nc_acc = n_ch = n_nc = 0
    for refs, hyp in zip(references, hypotheses):
        ref_line = text(refs[1] if len(refs) > 1 else refs[0])
        hyp_line = text(hyp)
        if ref_line not in NOCHANGE_SENTENCES:
            n_ch += 1
            ch_acc += hyp_line not in NOCHANGE_SENTENCES
        else:
            n_nc += 1
            nc_acc += hyp_line in NOCHANGE_SENTENCES
    scores["change_acc"] = ch_acc / max(n_ch, 1)
    scores["nochange_acc"] = nc_acc / max(n_nc, 1)
    return scores


class _EveryFifth:
    """Eval view: one row per image (rows where (i+1)%5==0,
    ref: train_CC.py:213)."""

    def __init__(self, ds: CaptionDataset):
        self.ds = ds
        self.idxs = [i for i in range(len(ds)) if (i + 1) % ds.cpi == 0]

    def __len__(self):
        return len(self.idxs)

    def __getitem__(self, i, rng=None):
        return self.ds.__getitem__(self.idxs[i], rng)


def run_caption_eval(
    cfg: CaptionRunConfig,
    run_dir: Optional[str] = None,
    split: Optional[str] = None,
    which: str = "best",
    save_json: bool = False,
    backbone_cfg=None,
) -> Dict[str, float]:
    """Standalone caption evaluation of a finished run (beam decode + the
    full metric suite). The reference only scores inside training
    (ref: /root/reference/scripts/train_CC.py:170-376); this detaches it so
    an existing checkpoint can be scored on any split. ``which`` picks the
    BLEU-4-gated ``best`` weights or the ``latest`` orbax step."""
    word_map = load_word_map(cfg)
    run_dir = run_dir or os.path.join(cfg.save_dir, f"{cfg.dataset}_cc_lr_{cfg.lr}")
    data = _EveryFifth(CaptionDataset(cfg.file_root, cfg.dataset, split or cfg.eval_split))
    loader = make_data_loader(
        "threaded", data, cfg.eval_batch_size, shuffle=False,
        num_workers=cfg.num_workers, collate=caption_collate, pad_final=True,
    )
    probe = data.__getitem__(0)
    model = build_caption_model(
        cfg, len(word_map), in_size=probe["pre"].shape[0], backbone_cfg=backbone_cfg
    )
    ckpt = CheckpointManager(run_dir)
    if which == "best":
        sample = jnp.zeros((1, model.in_height, model.in_width, 3), jnp.float32)
        template = model.init(
            jax.random.PRNGKey(0), sample, sample,
            captions=jnp.zeros((1, 4), jnp.int32),
        )
        variables = ckpt.restore_best(
            {"params": template["params"], "batch_stats": template.get("batch_stats", {})}
        )
    else:
        variables, step = ckpt.restore_latest_variables()
        print(f"evaluating latest checkpoint (step {step})")
    decode_fn = make_decode_fn(model, cfg.beam_size, word_map)
    return evaluate_captions(
        model, variables, loader, word_map, beam_size=cfg.beam_size,
        save_dir=run_dir if save_json else None, decode_fn=decode_fn,
    )


def run_caption_training(args) -> Dict[str, float]:
    cfg = CaptionRunConfig(
        file_root=args.file_root,
        dataset=args.dataset,
        word_map=getattr(args, "word_map", None),
        save_dir=args.save_dir,
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        encoder_lr=getattr(args, "encoder_lr", None),
        grad_clip=args.grad_clip,
        embed_dim=args.embed_dim,
        n_head=args.n_head,
        n_layer=args.n_layer,
        dropout=args.dropout,
        beam_size=args.beam_size,
        num_workers=args.num_workers,
        seed=args.seed,
        pretrained=args.pretrained,
        resume=args.resume,
        fine_tune_encoder=getattr(args, "fine_tune_encoder", True),
        compute_dtype=getattr(args, "compute_dtype", "float32"),
        loader=getattr(args, "loader", "threaded"),
        profile_dir=getattr(args, "profile_dir", None),
    )
    if getattr(args, "eval_batch_size", None):
        cfg = dataclasses.replace(cfg, eval_batch_size=args.eval_batch_size)
    # Multi-host CC: training shards like detection (loader process-sharding
    # + shard_batch global arrays); beam-search eval decodes host-local
    # slices and _allgather_caption_results reconstructs the global set on
    # every host, so the per-epoch BLEU-4 best gate (and the collective
    # orbax save it triggers) agrees across processes.
    word_map = load_word_map(cfg)
    vocab_size = len(word_map)
    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)
    for f in ("batch_size", "eval_batch_size"):
        rounded = multiple_of_devices(getattr(cfg, f), mesh)
        if rounded != getattr(cfg, f):
            print(f"{f} {getattr(cfg, f)} rounded up to {rounded} to divide over the mesh")
            cfg = dataclasses.replace(cfg, **{f: rounded})

    save_path = os.path.join(cfg.save_dir, f"{cfg.dataset}_cc_lr_{cfg.lr}")
    with setup_logger(save_path, dataclasses.asdict(cfg)) as logger:
        return _run_caption(cfg, logger, save_path, word_map, vocab_size, mesh, bsh, rsh)


def _run_caption(cfg, logger, save_path, word_map, vocab_size, mesh, bsh, rsh):
    train_data = CaptionDataset(cfg.file_root, cfg.dataset, "TRAIN")
    eval_data = _EveryFifth(CaptionDataset(cfg.file_root, cfg.dataset, cfg.eval_split))
    train_loader = make_data_loader(
        cfg.loader, train_data, cfg.batch_size, shuffle=True, seed=cfg.seed,
        num_workers=cfg.num_workers, collate=caption_collate, drop_last=True,
    )
    eval_loader = make_data_loader(
        cfg.loader, eval_data, cfg.eval_batch_size, shuffle=False,
        num_workers=cfg.num_workers, collate=caption_collate, pad_final=True,
    )

    sample_probe = train_data.__getitem__(0)
    model = build_caption_model(cfg, vocab_size, in_size=sample_probe["pre"].shape[0])
    steps_per_epoch = max(len(train_loader), 1)
    schedule = shrink_schedule(cfg.lr, steps_per_epoch, shrink_every_epochs=10, factor=0.5)
    tx = torch_adam(
        schedule, weight_decay=cfg.weight_decay, grad_clip_value=cfg.grad_clip
    )
    if cfg.encoder_lr is not None and cfg.encoder_lr != cfg.lr:
        # Separate encoder/decoder Adams (ref: train_CC.py:439-455).
        from change3d_tpu.train.optim import per_subtree_lr

        enc_schedule = shrink_schedule(
            cfg.encoder_lr, steps_per_epoch, shrink_every_epochs=10, factor=0.5
        )
        enc_tx = torch_adam(
            enc_schedule, weight_decay=cfg.weight_decay, grad_clip_value=cfg.grad_clip
        )
        tx = per_subtree_lr(enc_tx, tx)
    if not cfg.fine_tune_encoder:
        from change3d_tpu.train.optim import freeze_subtree

        tx = freeze_subtree(tx, "encoder")

    sample = next(iter(eval_loader))
    sample.pop("valid", None)
    sample.pop("all_captions", None)
    state = create_train_state(model, tx, jax.random.PRNGKey(cfg.seed), sample)
    if cfg.pretrained:
        backbone = load_x3d_pretrained(cfg.pretrained)
        variables = merge_backbone_variables(state.variables, backbone)
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
        state = state.replace(opt_state=tx.init(state.params))
    state = jax.device_put(state, rsh)

    ckpt = CheckpointManager(save_path)
    best_bleu4 = -1.0
    start_epoch = 0
    resume_step = 0
    skip_batches = 0
    if cfg.resume:
        state, resume_step = ckpt.restore(state)
        # Mid-epoch (preemption) checkpoints resume exactly: re-enter the
        # interrupted epoch, skip the already-trained prefix of its
        # deterministic permutation (see loop._run_detection).
        start_epoch = resume_step // steps_per_epoch
        skip_batches = resume_step % steps_per_epoch
        best_bleu4 = float(ckpt.load_meta().get("best_val", -1.0))
        state = jax.device_put(state, rsh)

    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    train_step = make_train_step(model, tx, compute_dtype=compute_dtype)
    # One decode fn per run: rebuilding it per epoch would re-trace the
    # 52-step beam scan every evaluation.
    decode_fn = make_decode_fn(model, cfg.beam_size, word_map)
    rng = jax.random.PRNGKey(cfg.seed + 1)
    results: Dict[str, float] = {}

    # Boundary preemption (SIGTERM during an epoch's final step): the epoch
    # trained fully but was never beam-evaluated or best-gated. Detect it on
    # resume via the sidecar and run the missing eval on the restored
    # end-of-epoch state (see loop._run_detection for the detection twin).
    if (
        cfg.resume
        and resume_step > 0
        and skip_batches == 0
        and int(ckpt.load_meta().get("preempted_at_step", -1)) == resume_step
        and start_epoch - 1 >= 0  # CC evaluates every epoch, incl. 0
    ):
        done_epoch = start_epoch - 1
        print(
            f"[resume] epoch {done_epoch} completed right at the preemption "
            f"point but was never evaluated — evaluating now",
            flush=True,
        )
        scores = evaluate_captions(
            model, state.variables, eval_loader, word_map, cfg.beam_size,
            save_dir=save_path, decode_fn=decode_fn,
        )
        logger.log_epoch(done_epoch, scores)
        if scores["Bleu_4"] >= best_bleu4:
            best_bleu4 = scores["Bleu_4"]
            ckpt.save_best(state.variables)
        ckpt.save_meta({"best_val": best_bleu4})
        results = scores

    tracer = WindowTracer(cfg.profile_dir)
    host_step = resume_step  # host mirror of state.step: no device syncs
    with PreemptionGuard() as guard:
        for epoch in range(start_epoch, cfg.epochs):
            train_loader.set_epoch(epoch)
            t0 = time.time()
            n_batches = len(train_loader)
            if epoch == start_epoch and skip_batches:
                print(
                    f"[resume] epoch {epoch}: skipping {skip_batches} "
                    f"already-trained batches (mid-epoch checkpoint)",
                    flush=True,
                )
                batch_iter = data_iter_from(train_loader, skip_batches)
            else:
                batch_iter = iter(train_loader)
            # Every step's loss/top1 accumulates into ONE device scalar (no
            # host sync — the queue stays full), so the logged epoch mean is
            # the exact every-iteration mean the reference logs
            # (ref: /root/reference/scripts/train_CC.py:152-160). Only the
            # progress prints host-sync, every 50 iters.
            loss_sum = top1_sum = None
            n_steps = 0
            for i, batch in enumerate(device_prefetch(batch_iter, bsh)):
                tracer.tick(i)
                batch.pop("all_captions", None)
                state, last_metrics = train_step(state, batch, rng)
                if loss_sum is None:
                    loss_sum, top1_sum = last_metrics["loss"], last_metrics["top1"]
                else:
                    loss_sum = loss_sum + last_metrics["loss"]
                    top1_sum = top1_sum + last_metrics["top1"]
                n_steps += 1
                host_step += 1
                guard.tick(host_step)
                if guard.triggered:
                    break
                if i % 50 == 0 and i and n_batches:
                    host = jax.device_get(last_metrics)
                    eta = (time.time() - t0) / (i + 1) * (n_batches - i - 1)
                    print(
                        f"  [epoch {epoch}] iter {i}/{n_batches} "
                        f"loss {float(host['loss']):.4f} top1 {float(host['top1']):.2f} "
                        f"eta {eta:.0f}s",
                        flush=True,
                    )
            tracer.close()
            if guard.triggered:
                ckpt.save(host_step, state, wait=True)
                ckpt.save_meta({"best_val": best_bleu4, "preempted_at_step": host_step})
                print(
                    f"[preempt] checkpoint saved at step {host_step}; exiting "
                    f"cleanly",
                    flush=True,
                )
                results["preempted_at_step"] = host_step
                return results
            mean_loss, mean_top1 = (
                (v / n_steps for v in jax.device_get((loss_sum, top1_sum)))
                if n_steps
                else (np.nan, np.nan)
            )
            print(
                f"[epoch {epoch}] loss {float(mean_loss):.4f} "
                f"top1 {float(mean_top1):.2f} ({time.time() - t0:.1f}s)"
            )

            scores = evaluate_captions(
                model, state.variables, eval_loader, word_map, cfg.beam_size,
                save_dir=save_path, decode_fn=decode_fn,
            )
            logger.log_epoch(epoch, scores)
            # Async: the disk write overlaps the next epoch's steps.
            ckpt.save(host_step, state, metrics={"Bleu_4": scores["Bleu_4"]}, wait=False)
            if scores["Bleu_4"] >= best_bleu4:
                best_bleu4 = scores["Bleu_4"]
                ckpt.save_best(state.variables)
            ckpt.save_meta({"best_val": best_bleu4})
            results = scores

    ckpt.wait()  # drain the last async save before reading best/ back
    # Final: reload the best weights and re-evaluate (mirrors the detection
    # loop and the reference's end-of-run test pass). Only the *restore* is
    # allowed to fail softly (no best saved on 0-epoch smoke runs); an eval
    # failure must surface, not silently return stale last-epoch scores.
    best_vars = None
    try:
        best_vars = ckpt.restore_best(state.variables)
    except Exception as e:
        print(f"best-model evaluation skipped (no best checkpoint): {e}")
    if best_vars is not None:
        results = evaluate_captions(
            model, best_vars, eval_loader, word_map, cfg.beam_size,
            save_dir=save_path, decode_fn=decode_fn,
        )
        logger.log_epoch(-1, results, split="test_best")
    return results
