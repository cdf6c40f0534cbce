"""Detector training on the synthetic face distribution.

Trains the FCN detector (`models/detector.py`) with a class-balanced BCE on
the score map + smooth-L1 on box deltas at positive cells.  Runs on whatever
JAX device is available (TPU preferred); the train step is one jitted
program per batch.

Usage:  python -m pyannote_video_tpu.train.train_detector [steps] [out.npz]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import detector
from ..models.nn import save_params
from . import data

# margin-hinge targets (logits).  The operating threshold sits between
# MARGIN_NEG and MARGIN_POS; the hinges train the separation directly
# (see loss_fn) rather than leaving it to post-hoc threshold calibration.
MARGIN_POS = 8.0
# hard-combo crops (data.AUG_HARD_P: strong roll + foreshortening + forced
# occlusion at once) get a LOWER positive target: demanding the full +8
# from low-evidence faces teaches the net that any vague warped blob is a
# high-confidence face, and background FP scores rise with them (measured:
# fp_n 13 → 110 on the unshifted probe domain).  6 still clears every
# distractor the wide probe has ever recorded (fp_max 2.5-4.6) with the
# >= 2-logit margin the operating point needs.
MARGIN_POS_HARD = 6.0
MARGIN_NEG = 0.0
MARGIN_W = 0.5
# negative-hinge weight multiplier: the r5 v4 fine-tune showed the
# positive hinge dragging decoy scores up with the hard positives
# (wide-probe fp_max 4.6 → 9.8 while real_min rose 0.8 → 8.8); the
# asymmetric extra pressure on mined negatives is what pushes the
# decoy tail back down without giving up the positive floor
NEG_HINGE_W = 3.0
NEG_MINE_K = 32      # hard-negative cells mined per image (was 8: too few —
                     # serve-time probes found 10x that many firing cells;
                     # r5: 24 → 32, the decoy tail needs more coverage)
# upper anchor on positive logits: without it, fine-tuning inflates the
# whole logit scale (BCE keeps pushing easy positives up without bound;
# a measured 800-step fine-tune blew p5 from 7 to 28 logits and dragged
# fp_max from 4.5 to 16 with it — same shape, 2.5x the scale, worse
# absolute tails).  Pinning positives into [MARGIN_POS, ANCHOR] keeps the
# margin objective about *separation*, not scale.
ANCHOR = MARGIN_POS + 4.0
# serve-scale bootstrapped hard-negative mining (train/mine.py): crop-scale
# clutter tuning hit a ceiling — two r5 fine-tunes moved the wide-probe
# margin −2.8 → −0.91 → −1.06 while trainer crops' own hardest negatives
# scored ≤ 3 logits (the 9.9-logit serve-time decoy family simply is not in
# the crop distribution; it needs the pyramid's chained-resample blur and
# bigger-than-window context).  Mining through the serve pyramid puts the
# actual failure modes in every batch.
MINE_EVERY = 25       # refresh cadence (steps); bootstraps with the weights
MINE_PER_BATCH = 4    # crops per batch substituted with mined negatives
# hard-POSITIVE mining at the same cadence: negatives-only mining measurably
# over-suppresses low-evidence posed faces (v6: wide-probe fp_n 240 → 51
# but BC real_min 8.8 → 4.5).  Mined under-scored faces re-enter as
# positive crops with the HARD margin target (MARGIN_POS_HARD — demanding
# the full +8 from them is how v4's fine-tune inflated the FP tail).
MINE_POS_PER_BATCH = 2


def loss_fn(params, frames, labels, deltas, delta_mask, hard):
    maps, params_new = detector.forward_maps(params, frames, train=True,
                                             compute_dtype=jnp.float32)
    logits = maps[..., 0]
    pred_deltas = maps[..., 1:]

    valid = labels >= 0.0  # -1 = ignore ring
    pos = labels == 1.0
    # class-balanced BCE: positives are rare
    bce = optax.sigmoid_binary_cross_entropy(logits, jnp.maximum(labels, 0.0))
    w = jnp.where(pos, 20.0, 1.0) * valid
    cls_loss = jnp.sum(bce * w) / jnp.maximum(jnp.sum(w), 1.0)

    # online hard-negative mining: the K highest-loss negative cells per
    # image get extra weight — suppresses persistent face-like background
    # patterns that plain BCE under-penalises
    neg_losses = jnp.where(pos | (labels < 0.0), 0.0, bce)
    B = neg_losses.shape[0]
    top_neg, _ = jax.lax.top_k(neg_losses.reshape(B, -1), NEG_MINE_K)
    cls_loss = cls_loss + 2.0 * jnp.mean(top_neg)

    # margin hinges: BCE saturates once a cell is on the right side of 0,
    # so the hardest real faces and decoys both pile up near the decision
    # boundary and the score tails overlap on unseen seeds (VERDICT r3
    # missing #2).  Explicit hinges keep gradient flowing until positives
    # clear their margin target and negatives fall below MARGIN_NEG —
    # training the separation the operating threshold needs, instead of
    # recalibrating the threshold into an overlap after every retrain.
    pos_target = jnp.where(hard[:, None, None] > 0.5,
                           MARGIN_POS_HARD, MARGIN_POS)
    pos_hinge = (jnp.maximum(pos_target - logits, 0.0)
                 + jnp.maximum(logits - ANCHOR, 0.0))
    cls_loss = cls_loss + MARGIN_W * (
        jnp.sum(pos_hinge * pos) / jnp.maximum(jnp.sum(pos), 1.0))
    neg_hinge = jnp.where(pos | (labels < 0.0), 0.0,
                          jnp.maximum(logits - MARGIN_NEG, 0.0))
    top_hinge, _ = jax.lax.top_k(neg_hinge.reshape(B, -1), NEG_MINE_K)
    cls_loss = cls_loss + NEG_HINGE_W * MARGIN_W * jnp.mean(top_hinge)

    reg_err = pred_deltas - deltas
    huber = jnp.where(jnp.abs(reg_err) < 1.0, 0.5 * reg_err ** 2,
                      jnp.abs(reg_err) - 0.5)
    reg_loss = jnp.sum(huber * delta_mask[..., None]) / jnp.maximum(
        jnp.sum(delta_mask) * 4.0, 1.0
    )
    return cls_loss + reg_loss, params_new


def train(steps: int = 600, batch: int = 16, size: int = 128,
          seed: int = 0, lr: float = 3e-4, log_every: int = 50,
          init_params: dict = None, mine: bool = True,
          deep_width: int = 96, ckpt_path: str = None,
          ckpt_every: int = 400):
    rng = np.random.default_rng(seed)
    params = (init_params if init_params is not None
              else detector.init_params(jax.random.PRNGKey(seed),
                                        deep_width=deep_width))
    miner = None
    if mine:
        from .mine import HardNegativeMiner

        miner = HardNegativeMiner(crop=size, seed=seed + 77)
    # cosine decay to ~lr/10: the margin hinges keep late-training gradient
    # alive on the tails, so the step size must come down for the easy bulk
    # not to wander
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.1)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, frames, labels, deltas, mask, hard):
        (loss, params_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, frames, labels, deltas, mask, hard
        )
        updates, opt_state = tx.update(grads, opt_state, params_bn)
        return optax.apply_updates(params_bn, updates), opt_state, loss

    t0 = time.time()

    # overlap host-side crop rendering with the device step (super-scale
    # rendering is host-bound; same pattern as train_embedder._batch_stream)
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=4)
    stop = threading.Event()

    def worker():
        try:
            while not stop.is_set():
                frames, boxes, hard = data.detection_batch(
                    rng, batch=batch, height=size, width=size,
                    return_hard=True)
                item = (frames, data.detection_targets(boxes, size, size),
                        hard)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue_mod.Full:
                        pass
        except BaseException as exc:  # propagate instead of hanging q.get()
            q.put(exc)

    threading.Thread(target=worker, daemon=True).start()
    for step in range(steps):
        item = q.get()
        if isinstance(item, BaseException):
            raise item
        frames, (labels, deltas, mask), hard = item
        if miner is not None:
            if step % MINE_EVERY == 0:
                miner.refresh(params)
                miner.refresh_positives(params)
            crops = miner.sample(rng, MINE_PER_BATCH)
            if crops:
                # substitute mined all-negative crops for the last slots
                # (face-bearing crops keep the batch front; sampling order
                # is already random so the position carries no bias)
                for j, patch in enumerate(crops):
                    i = batch - 1 - j
                    frames[i] = patch
                    labels[i] = 0.0
                    deltas[i] = 0.0
                    mask[i] = 0.0
                    hard[i] = 0.0
            pos = miner.sample_pos(rng, MINE_POS_PER_BATCH)
            for j, (patch, box) in enumerate(pos):
                i = batch - 1 - len(crops) - j
                frames[i] = patch
                lb, dl, mk = data.detection_targets([[box]], size, size)
                labels[i], deltas[i], mask[i] = lb[0], dl[0], mk[0]
                hard[i] = 1.0  # low-evidence face: HARD margin target
        params, opt_state, loss = step_fn(
            params, opt_state,
            jnp.asarray(frames, dtype=jnp.float32), jnp.asarray(labels),
            jnp.asarray(deltas), jnp.asarray(mask), jnp.asarray(hard),
        )
        if step % log_every == 0 or step == steps - 1:
            mined = ""
            if miner is not None:
                mined = (f"  mined neg {len(miner)} "
                         f"(max {miner.last_max_logit:.1f}) "
                         f"pos {len(miner._pos_buf)} "
                         f"(min {miner.last_min_pos_logit:.1f})")
            print(f"step {step:5d}  loss {float(loss):.4f}  "
                  f"({time.time() - t0:.1f}s){mined}", flush=True)
        if ckpt_path and step and step % ckpt_every == 0:
            # periodic checkpoint: a wedged device RPC (the tunnelled TPU
            # relay can stall mid-run) must not cost the whole run
            from ..models.nn import save_params

            save_params(ckpt_path, params)
            print(f"ckpt @ {step} -> {ckpt_path}", flush=True)
    stop.set()
    return params


def main():
    """usage: train_detector [steps] [out.npz] [--resume] [--init=ckpt.npz]
                             [--lr=3e-4] [--no-mine]

    ``--resume`` continues from the packaged checkpoint (fresh optimizer);
    ``--init=<path>`` continues from an arbitrary checkpoint (e.g. chained
    fine-tune rounds).  Fine-tunes want a colder ``--lr`` (1e-4) than
    from-scratch training.  ``--no-mine`` disables serve-scale hard-negative
    mining (A/B only; mining is what holds the wide-probe margin).
    """
    from ..models.nn import load_params
    from ..models.weights import DETECTOR_FILE

    args = [a for a in sys.argv[1:]
            if a not in ("--resume", "--no-mine")
            and not a.startswith(("--lr=", "--init="))]
    resume = "--resume" in sys.argv[1:]
    init_path = next((a.split("=", 1)[1] for a in sys.argv[1:]
                      if a.startswith("--init=")),
                     str(DETECTOR_FILE) if resume else None)
    lr = next((float(a.split("=", 1)[1]) for a in sys.argv[1:]
               if a.startswith("--lr=")), 3e-4)
    steps = int(args[0]) if len(args) > 0 else 600
    out = args[1] if len(args) > 1 else str(DETECTOR_FILE)
    init = load_params(init_path) if init_path else None
    params = train(steps=steps, init_params=init, lr=lr,
                   mine="--no-mine" not in sys.argv[1:],
                   ckpt_path=out + ".ckpt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_params(out, params)
    print("saved", out)


if __name__ == "__main__":
    main()
