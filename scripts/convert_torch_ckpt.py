#!/usr/bin/env python
"""Convert torch S3PRL checkpoints to this framework's native format.

Deployment hosts need torch only for reading the original S3PRL
``states-*.ckpt`` files; this one-shot converter produces a torch-free
native checkpoint (pickled numpy pytrees) that ``build_upstream`` /
``--dckpt`` consume directly.

  python scripts/convert_torch_ckpt.py upstream.ckpt --out tera_native.ckpt
  python scripts/convert_torch_ckpt.py downstream.ckpt --downstream LSTM \
      --kind downstream --out head_native.ckpt
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--out", required=True)
    ap.add_argument("--kind", choices=["upstream", "downstream"],
                    default="upstream")
    ap.add_argument("--downstream", default="LSTM",
                    help="model class for --kind downstream")
    args = ap.parse_args()

    import torch

    if args.kind == "upstream":
        from speech_enhancement_by_s3prl_tpu.models.torch_import import (
            load_s3prl_checkpoint,
        )

        loaded = load_s3prl_checkpoint(args.ckpt)
        payload = {
            "Upstream": loaded.params,
            "Settings": {"Config": loaded.pretrain_config, "Paras": {}},
            "Meta": {
                "input_dim": loaded.input_dim,
                "output_size": loaded.output_size,
                "log_domain": loaded.log_domain,
            },
        }
    else:
        from speech_enhancement_by_s3prl_tpu.models.torch_import import (
            convert_downstream_state,
        )

        t = torch.load(args.ckpt, map_location="cpu", weights_only=False)
        sd = t["Downstream"] if "Downstream" in t else {
            ".".join(k.split(".")[1:]): v for k, v in t["SmallModel"].items()
        }
        paras = t["Settings"]["Paras"]
        payload = {
            "Downstream": {
                "params": convert_downstream_state(sd, args.downstream)
            },
            "Optimizer": {},
            "Global_step": int(t.get("Global_step", 0)),
            "Settings": {
                "Config": t["Settings"]["Config"],
                "Paras": vars(paras) if not isinstance(paras, dict) else paras,
            },
        }

    with open(args.out, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
