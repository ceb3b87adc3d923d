"""Token-LM architecture registry: one place that maps a trainer args
dict (train/lstm_trainer.py writes it into best.json) to a built model,
so every consumer — the trainer, examples/music_continuation.py,
deploy/export_lm.py, deploy/http_lm.py — agrees on how `arch` resolves.

The reference has exactly one token LM (the LSTM,
/root/reference/train_music_lstm_v2.py:146-202) and no deployment for
it; here both the reference-parity LSTM and the TPU-first transformer
(models/token_transformer.py) are first-class across training, AOT
export, and HTTP serving.
"""

from __future__ import annotations

from typing import Any

ARCHS = ("lstm", "transformer")


def build_token_lm(args: dict, *, dropout: float = 0.0, dtype: Any = None,
                   for_inference: bool = False):
    """Build the token LM a trainer-args dict describes.

    ``args`` is the lstm_trainer argparse namespace as a dict (the exact
    object embedded in a run's best.json); ``arch`` defaults to "lstm"
    for runs that predate the transformer. ``dropout`` defaults to 0.0
    (the inference/deploy setting); trainers pass their own rate.

    ``for_inference=True`` strips the TRAINING-only implementation knobs
    (``--flash_lm`` Pallas attention, ``--remat_lm`` rematerialization)
    when rebuilding from a run's best.json for export/serving. Both only
    change how the training forward is computed, never its numerics
    (remat is bit-equal by construction; flash is the same attention),
    and the Pallas TPU flash kernel cannot lower on the CPU platform the
    exporters always include — so a --flash_lm-trained run must not
    carry the flag into deploy rebuilds.
    """
    arch = args.get("arch", "lstm")
    if arch == "transformer":
        from mqgan_tpu.models.token_transformer import MusicTransformer

        return MusicTransformer(
            vocab_size=args["vocab_size"], num_genres=args["num_genres"],
            emb_dim=args["emb_dim"], n_layers=args["n_layers"],
            n_heads=args["n_heads"], mlp_ratio=args["mlp_ratio"],
            pad_id=args["pad_id"], dropout=dropout,
            remat=(not for_inference) and bool(args.get("remat_lm", False)),
            flash=(not for_inference) and bool(args.get("flash_lm", False)),
            flash_blocks=(None if for_inference or not args.get("flash_blocks")
                          else tuple(args["flash_blocks"])),
            dtype=dtype,
        )
    if arch == "lstm":
        from mqgan_tpu.models.music_lstm import MusicLSTM

        return MusicLSTM(
            vocab_size=args["vocab_size"], num_genres=args["num_genres"],
            emb_dim=args["emb_dim"], lstm_hid=args["lstm_hid"],
            lstm_layers=args["lstm_layers"], pad_id=args["pad_id"],
            dropout=dropout, dtype=dtype,
        )
    raise ValueError(f"unknown token-LM arch {arch!r} (expected {ARCHS})")


def lm_arch(model) -> str:
    """The registry name of a built token-LM instance."""
    from mqgan_tpu.models.music_lstm import MusicLSTM
    from mqgan_tpu.models.token_transformer import MusicTransformer

    if isinstance(model, MusicTransformer):
        return "transformer"
    if isinstance(model, MusicLSTM):
        return "lstm"
    raise ValueError(f"not a token LM: {type(model).__name__}")


def served_sampler(model):
    """The traced-control per-row served sampler for a model — the
    shared (genre_ids, seeds, prompt, prompt_lens, temperature, top_k,
    top_p, vocab_mask, *, max_len, bos_id) signature both archs honor."""
    from mqgan_tpu.models import lm_sampling

    return (lm_sampling.generate_tokens_transformer_served
            if lm_arch(model) == "transformer"
            else lm_sampling.generate_tokens_served)


def arch_config(model) -> dict:
    """The arch-specific hyperparameters worth recording in an export
    manifest (enough to rebuild the model with build_token_lm)."""
    base = {
        "arch": lm_arch(model),
        "vocab_size": model.vocab_size,
        "num_genres": model.num_genres,
        "emb_dim": model.emb_dim,
        "pad_id": model.pad_id,
    }
    if base["arch"] == "transformer":
        base.update(n_layers=model.n_layers, n_heads=model.n_heads,
                    mlp_ratio=model.mlp_ratio)
    else:
        base.update(lstm_hid=model.lstm_hid, lstm_layers=model.lstm_layers)
    return base
