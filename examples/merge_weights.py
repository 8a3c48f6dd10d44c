"""Merge stage-1 identity + stage-2 motion adapters: keep A1, B = B1 + B2.

Mirror of the reference ``animation/merge_weights.py:19-48``.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage1", type=str, required=True)
    p.add_argument("--stage2", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    args = p.parse_args()

    from fairygen_tpu.core.io import load_state_dict, save_safetensors
    from fairygen_tpu.models.adapters import merge_stage_weights

    merged = merge_stage_weights(load_state_dict(args.stage1),
                                 load_state_dict(args.stage2))
    save_safetensors(args.output, merged)
    print(f"merged {len(merged)} tensors -> {args.output}")


if __name__ == "__main__":
    main()
