"""550M-parameter fine-tune rehearsal on the real chip (VERDICT r4 #5).

The production recipe fine-tunes xlm-roberta-large (550M params;
``configs/*.yaml``, reference workflow ``/root/reference/README.md:103-178``)
but real checkpoints cannot be downloaded in a zero-egress environment.
This script synthesizes a RANDOM xlm-roberta-large ``save_pretrained``
directory — the same artifact format as a weights drop — and drives the
REAL production path end-to-end on the chip:

  HF import at 550M -> cli parity stage-1 (ModelFinetuner: Adam state,
  remat=dots_saveable, HBM fit) -> tuned-encoder export -> stage-2 init
  from the export -> prediction + conlleval.

Usage (TPU):  python examples/rehearse_large.py [--out DIR]
The per-step time and peak stats land in <out>/rehearsal.json.
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def synth_checkpoint(out: Path, large: bool = True) -> Path:
    """Random-init xlm-roberta-large save_pretrained directory (the
    artifact a real weights drop would provide; config shapes from the
    public xlm-roberta-large config)."""
    import torch
    import transformers

    cfg = transformers.XLMRobertaConfig(
        vocab_size=250002, hidden_size=1024, num_hidden_layers=24,
        num_attention_heads=16, intermediate_size=4096,
        max_position_embeddings=514, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5,
    ) if large else transformers.XLMRobertaConfig(
        vocab_size=2003, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=130, type_vocab_size=1, pad_token_id=1)
    torch.manual_seed(0)
    t0 = time.perf_counter()
    model = transformers.XLMRobertaModel(cfg, add_pooling_layer=False)
    model.save_pretrained(out)
    n = sum(p.numel() for p in model.parameters())
    print(f"[rehearse] synthesized {n/1e6:.0f}M-param checkpoint at {out} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/rehearse_large")
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (CPU smoke of the same path)")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=1)
    args = ap.parse_args(argv)

    out = Path(args.out)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    ckpt = synth_checkpoint(out / "ckpt", large=not args.small)

    data = out / "data"
    for stage in ("stage1", "stage2"):
        shutil.copytree(REPO / "tests/fixtures/ner_toy", data / stage)

    from kbner_tpu.cli import main as cli_main

    t0 = time.perf_counter()
    cli_main([
        "parity", "--weights", str(ckpt), "--hash_tokenizer",
        "--hash_vocab", "2000", "--data", str(data),
        "--stage1_folder", "stage1", "--stage2_folder", "stage2",
        "--out", str(out / "run"),
        "--epochs_stage1", str(args.epochs),
        "--epochs_stage2", str(args.epochs),
        "--lr", "5e-6", "--lr_rate", "100",
        "--batch_size", str(args.batch_size),
    ])
    wall = time.perf_counter() - t0

    summary = json.loads((out / "run" / "parity.json").read_text())
    enc = out / "run" / "stage1" / "finetuned-encoder.msgpack"
    rec = {
        "parity": summary["parity"],
        "wall_s": round(wall, 1),
        "encoder_export_bytes": enc.stat().st_size if enc.exists() else 0,
        "batch_size": args.batch_size,
    }
    # per-epoch step timing from the stage-1 loss.tsv (epoch wall clock)
    tsv = out / "run" / "stage1" / "loss.tsv"
    if tsv.exists():
        rec["stage1_loss_tsv"] = tsv.read_text().strip().splitlines()[-3:]
    (out / "rehearsal.json").write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
