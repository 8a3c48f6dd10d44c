"""Two-stage propagated-motion-adapter finetune for Wan TI2V-5B.

Mirror of ``animation/train.py`` + ``stage1_id.sh`` / ``stage2_motion.sh``:

  stage 1 (identity): LoRA r32 on q,k,v,o,ffn.0,ffn.2 with element dropout
    p=0.8 on B (training_module.py:233-242); first video frame is the
    conditioning image (extra_inputs=input_image).
  stage 2 (motion): pass --lora_checkpoint <stage1.safetensors> — loads and
    freezes A1/B1, adds zero-init B2 with dropout 0.5
    (training_module.py:266-352).

Preprocessing (VAE encode + UMT5) runs once per unique sample and is cached
in memory — the TPU analogue of the reference's 2-phase data_process/train
split (cache to .npz via --task sft:data_process for large datasets).

Example (stage 1):
  python examples/wan_train.py --dataset_base_path data/pig_walk \
    --dataset_metadata_path data/pig_walk/metadata.csv --dataset_repeat 300 \
    --model_paths '["dit.safetensors","vae.safetensors","umt5.safetensors"]' \
    --tokenizer_path ckpts/umt5-tokenizer --extra_inputs input_image \
    --height 480 --width 832 --num_frames 81 \
    --lora_base_model dit --lora_rank 32 --output_path ./stage1 --save_steps 100
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    from fairygen_tpu.training.parsers import add_general_config, add_video_size_config

    parser = add_general_config(parser)
    parser = add_video_size_config(parser)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fairygen_tpu.core.meshes import make_mesh
    from fairygen_tpu.data import UnifiedDataset
    from fairygen_tpu.models.adapters import (
        add_lora_to_wan_dit,
        lora_trainable_filter,
        normalize_lora_keys,
    )
    from fairygen_tpu.core.io import load_state_dict
    from fairygen_tpu.models.wan.vae import vae38_encode
    from fairygen_tpu.pipelines.wan_video import WanVideoPipeline
    from fairygen_tpu.training.optimizers import make_optimizer
    from fairygen_tpu.training.runner import ModelLogger, launch_training_task
    from fairygen_tpu.training.train_step import (
        make_wan_distill_train_step,
        make_wan_sft_train_step,
    )

    # reference train.py:156-165 plumbing: we train the DiT's LoRA only
    # (the VAE/TE are frozen preprocessing), so reject silently-ignored
    # selections rather than train the wrong thing — and do it BEFORE the
    # minutes-long checkpoint load
    for flag, val in (("trainable_models", args.trainable_models),
                      ("lora_base_model", args.lora_base_model)):
        if val not in (None, "dit"):
            parser.error(f"--{flag}={val}: only 'dit' is trainable here "
                         "(VAE/text encoder run as frozen preprocessing)")
    extra_inputs = (args.extra_inputs.split(",") if args.extra_inputs else [])
    unknown = [e for e in extra_inputs if e != "input_image"]
    if unknown:
        parser.error(f"--extra_inputs {unknown}: only input_image is "
                     "supported (first-frame conditioning, train.py:65-70)")

    pipe = WanVideoPipeline.from_pretrained(
        json.loads(args.model_paths), tokenizer_path=args.tokenizer_path,
        dtype=jnp.bfloat16,
    )

    stage2 = args.lora_checkpoint is not None
    params = add_lora_to_wan_dit(
        pipe.dit_params, jax.random.key(0), rank=args.lora_rank,
        targets=tuple(args.lora_target_modules.split(",")), with_b2=stage2,
    )
    if stage2:
        # load stage-1 A1/B1 into the adapter slots
        sd = normalize_lora_keys(load_state_dict(args.lora_checkpoint))
        blocks = params["blocks"]
        import re

        for k in [k for k in sd if k.endswith(".lora_A.weight")]:
            m = re.match(r"blocks\.(\d+)\.(self_attn|cross_attn)\.(q|k|v|o)\.lora_A", k)
            m2 = re.match(r"blocks\.(\d+)\.ffn\.(0|2)\.lora_A", k)
            if m:
                i, sub, proj = int(m.group(1)), m.group(2), m.group(3)
            elif m2:
                i, sub = int(m2.group(1)), "ffn"
                proj = "fc1" if m2.group(2) == "0" else "fc2"
            else:
                continue
            ap = blocks[sub][proj]["lora"]
            ap["A"] = ap["A"].at[i].set(jnp.asarray(sd[k].T, ap["A"].dtype))
            bk = k.replace("lora_A", "lora_B")
            ap["B"] = ap["B"].at[i].set(jnp.asarray(sd[bk].T, ap["B"].dtype))

    mesh = make_mesh(data=args.mesh_data, seq=args.mesh_seq,
                     pipe=args.mesh_pipe)
    trainable = lora_trainable_filter(("B2",) if stage2 else ("A", "B"))
    remat = ("offload" if args.use_gradient_checkpointing_offload
             else args.use_gradient_checkpointing)
    if args.task.startswith("direct_distill"):
        if args.mesh_pipe > 1:
            parser.error("--mesh_pipe is only supported for the sft task")
        # few-step distillation (reference train.py:59-61 DirectDistillLoss)
        init_state, train_step = make_wan_distill_train_step(
            pipe.dit_cfg,
            make_optimizer(args.optimizer, args.learning_rate,
                           args.weight_decay, args.max_grad_norm),
            mesh=mesh,
            num_inference_steps=args.distill_steps,
            remat=remat,
            trainable_filter=trainable,
        )
    else:
        init_state, train_step = make_wan_sft_train_step(
            pipe.dit_cfg,
            make_optimizer(args.optimizer, args.learning_rate,
                           args.weight_decay, args.max_grad_norm),
            mesh=mesh,
            remat=remat,
            trainable_filter=trainable,
            lora_b_dropout=("B2", 0.5) if stage2 else ("B", 0.8),
            gradient_accumulation_steps=args.gradient_accumulation_steps,
            pp_microbatches=args.pp_microbatches,
            # --extra_inputs input_image = first frame is the clean
            # conditioning image (defaults to the model's own fuse flag)
            first_frame_clean=True if "input_image" in extra_inputs else None,
        )
    if args.mesh_pipe > 1:
        from fairygen_tpu.parallel.pipeline import shard_blocks_over_pipe

        params = shard_blocks_over_pipe(params, mesh)
    elif args.fsdp:
        from fairygen_tpu.parallel.tensor_parallel import fsdp_shard_params

        params = fsdp_shard_params(params, mesh)
    state = init_state(params)

    dataset = UnifiedDataset(
        base_path=args.dataset_base_path,
        metadata_path=args.dataset_metadata_path,
        repeat=args.dataset_repeat,
        data_file_keys=tuple(args.data_file_keys.split(",")),
        main_data_operator=UnifiedDataset.default_video_operator(
            base_path=args.dataset_base_path,
            height=args.height, width=args.width, max_pixels=args.max_pixels,
            num_frames=args.num_frames,
        ),
    )

    # preprocessing cache (one VAE/TE pass per unique sample)
    cache = {}

    def collate(sample):
        key = id(sample.get("video", sample.get("prompt")))
        sid = sample.get("prompt", "") + str(len(sample.get("video", [])))
        if sid in cache:
            return cache[sid]
        from fairygen_tpu.core.imaging import preprocess_video

        video = jnp.asarray(preprocess_video(sample["video"]), jnp.bfloat16)
        latents = vae38_encode(pipe.vae_params, pipe.vae_cfg, video)
        context = pipe.encode_prompt(sample["prompt"])
        batch = {"latents": latents.astype(jnp.bfloat16), "context": context}
        cache[sid] = batch
        return batch

    if args.task.endswith(":data_process"):
        # 2-phase stage 1 (reference runner.py:50-71): cache the VAE/TE
        # preprocessing to .npz and exit; the ':train' stage consumes it
        # via UnifiedDataset(metadata_path=None, base_path=<cache dir>)
        from fairygen_tpu.training.data_process import (
            launch_data_process_task,
        )

        launch_data_process_task(dataset, collate, args.output_path)
        return
    if args.task.endswith(":train"):
        dataset = UnifiedDataset(base_path=args.dataset_base_path,
                                 metadata_path=None,
                                 repeat=args.dataset_repeat)

        def collate(sample):  # noqa: F811 — cached tensors pass through
            # the .npz cache stores float32 (bf16 has no npz dtype);
            # restore the training dtype the in-memory collate produces
            return {
                k: (jnp.asarray(v, jnp.bfloat16)
                    if np.issubdtype(np.asarray(v).dtype, np.floating) else v)
                for k, v in sample.items()
            }

    logger = ModelLogger(args.output_path,
                         remove_prefix_in_ckpt=args.remove_prefix_in_ckpt,
                         async_save=args.async_checkpoint)
    if args.resume_from:
        from fairygen_tpu.training.runner import restore_train_state

        state = restore_train_state(
            args.resume_from, jax.eval_shape(lambda: state))
        print(f"resumed from {args.resume_from} at step {int(state.step)}")
    launch_training_task(
        state, train_step, dataset, collate,
        num_epochs=args.num_epochs, save_steps=args.save_steps,
        logger=logger, mesh=mesh,
        preemption_checkpoint=args.preemption_checkpoint,
        shuffle=args.dataset_shuffle,
        num_workers=args.dataset_num_workers,
    )


if __name__ == "__main__":
    main()
