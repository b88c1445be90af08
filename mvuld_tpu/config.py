"""Default configuration tree for MVulD-TPU.

Key names mirror the reference yacs tree (reference: mvuld/config.py:5-322) so
that the reference's YAML config files (e.g. configs/mySwin/
swinv2_base_patch4_window24to28_384to448_1ktoMYDATA_ft.yaml) load unmodified.

Deliberate departures from the reference:
  * ``MODEL.MULTI.ARCH`` is a real flag selecting the fusion-model ablation.
    The reference selects ablations by editing commented-out source lines
    (mvuld/main_bigvul.py:123-146, config.py:252-307) — here it is config.
  * ``PARALLEL`` describes the device mesh (data/model axes). The reference
    only has single-axis DDP via torch.distributed (SURVEY §2.5).
  * ``DTYPE`` replaces AMP flags: bf16 is the native TPU compute type, so
    there is no GradScaler machinery (AMP_ENABLE is accepted and mapped).
"""

from __future__ import annotations

import os
from typing import Any

from mvuld_tpu.core.cfgnode import CfgNode


def default_config() -> CfgNode:
    _C = CfgNode()
    _C.BASE = [""]

    # ------------------------------------------------------------------ data
    _C.DATA = CfgNode()
    _C.DATA.BATCH_SIZE = 128
    _C.DATA.DATA_PATH = "datasets"
    _C.DATA.DATASET = "imagenet"
    _C.DATA.IMG_SIZE = 384
    _C.DATA.INTERPOLATION = "bicubic"
    _C.DATA.ZIP_MODE = False
    _C.DATA.CACHE_MODE = "part"
    _C.DATA.PIN_MEMORY = False
    _C.DATA.NUM_WORKERS = 8
    # graph-modality options (new; reference hard-codes these)
    _C.DATA.GTYPE = "all"          # ast | cfg | cdg | pdg | cfgcdg | all
    _C.DATA.MAX_NODES = 100        # pad/truncate per-graph node count (GraphModel.py:134)
    _C.DATA.MAX_EDGES = 512        # static edge budget for dense batching
    _C.DATA.NODE_TOKENS = 64       # per-node token budget (data_list.py:239-256)
    _C.DATA.NODE_NUMERIC = 0       # k>0: append 2k numeric-magnitude
    #                                scalars (log1p of the first k integer
    #                                literals on the node's line + first k
    #                                from its dependency sources) to the
    #                                pos features — see
    #                                cpg.numeric_literal_feats
    _C.DATA.NODE_CONTEXT = "none"  # "deps": per-node text gains its
    #                                REACHING_DEF/CDG/CFG source lines
    #                                (IVDetect's dependency channels,
    #                                ivdetect/dataset.py:122-301) so
    #                                cross-site literal relations become
    #                                local token-sequence features
    _C.DATA.FUNC_TOKENS = 512      # whole-function token budget (unixcoder.py:31)

    # ----------------------------------------------------------------- model
    _C.MODEL = CfgNode()
    _C.MODEL.TYPE = "swinv2"
    _C.MODEL.NAME = "swinv2_base_patch4_window24to28"
    _C.MODEL.PRETRAINED = ""
    _C.MODEL.RESUME = ""
    _C.MODEL.NUM_CLASSES = 2
    _C.MODEL.DROP_RATE = 0.0
    _C.MODEL.DROP_PATH_RATE = 0.1
    _C.MODEL.LABEL_SMOOTHING = 0.1

    _C.MODEL.SWIN = CfgNode()
    _C.MODEL.SWIN.PATCH_SIZE = 4
    _C.MODEL.SWIN.IN_CHANS = 3
    _C.MODEL.SWIN.EMBED_DIM = 96
    _C.MODEL.SWIN.DEPTHS = [2, 2, 6, 2]
    _C.MODEL.SWIN.NUM_HEADS = [3, 6, 12, 24]
    _C.MODEL.SWIN.WINDOW_SIZE = 7
    _C.MODEL.SWIN.MLP_RATIO = 4.0
    _C.MODEL.SWIN.QKV_BIAS = True
    _C.MODEL.SWIN.QK_SCALE = None
    _C.MODEL.SWIN.APE = False
    _C.MODEL.SWIN.PATCH_NORM = True

    _C.MODEL.SWINV2 = CfgNode()
    _C.MODEL.SWINV2.PATCH_SIZE = 4
    _C.MODEL.SWINV2.IN_CHANS = 3
    _C.MODEL.SWINV2.EMBED_DIM = 96
    _C.MODEL.SWINV2.DEPTHS = [2, 2, 6, 2]
    _C.MODEL.SWINV2.NUM_HEADS = [3, 6, 12, 24]
    _C.MODEL.SWINV2.WINDOW_SIZE = 7
    _C.MODEL.SWINV2.MLP_RATIO = 4.0
    _C.MODEL.SWINV2.QKV_BIAS = True
    _C.MODEL.SWINV2.APE = False
    _C.MODEL.SWINV2.PATCH_NORM = True
    _C.MODEL.SWINV2.PRETRAINED_WINDOW_SIZES = [0, 0, 0, 0]

    _C.MODEL.SWIN_MOE = CfgNode()
    _C.MODEL.SWIN_MOE.PATCH_SIZE = 4
    _C.MODEL.SWIN_MOE.IN_CHANS = 3
    _C.MODEL.SWIN_MOE.EMBED_DIM = 96
    _C.MODEL.SWIN_MOE.DEPTHS = [2, 2, 6, 2]
    _C.MODEL.SWIN_MOE.NUM_HEADS = [3, 6, 12, 24]
    _C.MODEL.SWIN_MOE.WINDOW_SIZE = 7
    _C.MODEL.SWIN_MOE.MLP_RATIO = 4.0
    _C.MODEL.SWIN_MOE.QKV_BIAS = True
    _C.MODEL.SWIN_MOE.QK_SCALE = None
    _C.MODEL.SWIN_MOE.APE = False
    _C.MODEL.SWIN_MOE.PATCH_NORM = True
    _C.MODEL.SWIN_MOE.MLP_FC2_BIAS = True
    _C.MODEL.SWIN_MOE.INIT_STD = 0.02
    _C.MODEL.SWIN_MOE.PRETRAINED_WINDOW_SIZES = [0, 0, 0, 0]
    _C.MODEL.SWIN_MOE.MOE_BLOCKS = [[-1], [-1], [-1], [-1]]
    _C.MODEL.SWIN_MOE.NUM_LOCAL_EXPERTS = 1
    _C.MODEL.SWIN_MOE.TOP_VALUE = 1
    _C.MODEL.SWIN_MOE.CAPACITY_FACTOR = 1.25
    _C.MODEL.SWIN_MOE.COSINE_ROUTER = False
    _C.MODEL.SWIN_MOE.NORMALIZE_GATE = False
    _C.MODEL.SWIN_MOE.USE_BPR = True
    _C.MODEL.SWIN_MOE.IS_GSHARD_LOSS = False
    _C.MODEL.SWIN_MOE.GATE_NOISE = 1.0
    _C.MODEL.SWIN_MOE.COSINE_ROUTER_DIM = 256
    _C.MODEL.SWIN_MOE.COSINE_ROUTER_INIT_T = 0.5
    _C.MODEL.SWIN_MOE.MOE_DROP = 0.0
    _C.MODEL.SWIN_MOE.AUX_LOSS_WEIGHT = 0.01

    _C.MODEL.SWIN_MLP = CfgNode()
    _C.MODEL.SWIN_MLP.PATCH_SIZE = 4
    _C.MODEL.SWIN_MLP.IN_CHANS = 3
    _C.MODEL.SWIN_MLP.EMBED_DIM = 96
    _C.MODEL.SWIN_MLP.DEPTHS = [2, 2, 6, 2]
    _C.MODEL.SWIN_MLP.NUM_HEADS = [3, 6, 12, 24]
    _C.MODEL.SWIN_MLP.WINDOW_SIZE = 7
    _C.MODEL.SWIN_MLP.MLP_RATIO = 4.0
    _C.MODEL.SWIN_MLP.APE = False
    _C.MODEL.SWIN_MLP.PATCH_NORM = True

    # fusion (tri-modal) model options
    _C.MODEL.MULTI = CfgNode()
    _C.MODEL.MULTI.RESUME = ""
    # registry key for the fusion architecture; 'multi_defect_new_gcn' is the
    # paper's production model (Multi_DefectModel_new_GCN, GraphModel.py:81-211)
    _C.MODEL.MULTI.ARCH = "multi_defect_new_gcn"
    _C.MODEL.MULTI.HIDDEN = 512
    _C.MODEL.MULTI.GAT_HEADS = 4
    _C.MODEL.MULTI.GAT_LAYERS = 2
    _C.MODEL.MULTI.NUM_HIDDEN_FC = 8        # shared FC stack (GraphModel.py:167-177)
    _C.MODEL.MULTI.NUM_RS_GCN = 8           # Rs-GCN blocks (GraphModel.py:191-198)
    _C.MODEL.MULTI.IMG_DIM = 1024           # SwinV2-base forward_features dim
    _C.MODEL.MULTI.TEXT_DIM = 768           # UniXcoder hidden dim
    _C.MODEL.MULTI.POS_DIM = 4              # OCR bbox feature dim

    # UniXcoder / text encoder options (new section; reference hard-codes)
    _C.MODEL.UNIXCODER = CfgNode()
    _C.MODEL.UNIXCODER.VOCAB_SIZE = 51416   # microsoft/unixcoder-base-nine
    _C.MODEL.UNIXCODER.HIDDEN = 768
    _C.MODEL.UNIXCODER.LAYERS = 12
    _C.MODEL.UNIXCODER.HEADS = 12
    _C.MODEL.UNIXCODER.INTERMEDIATE = 3072
    _C.MODEL.UNIXCODER.MAX_POSITIONS = 1026
    _C.MODEL.UNIXCODER.PRETRAINED = ""

    # ----------------------------------------------------------------- train
    _C.TRAIN = CfgNode()
    _C.TRAIN.START_EPOCH = 0
    _C.TRAIN.EPOCHS = 500
    _C.TRAIN.WARMUP_EPOCHS = 20
    _C.TRAIN.WEIGHT_DECAY = 0.005
    _C.TRAIN.BASE_LR = 5e-5
    _C.TRAIN.WARMUP_LR = 5e-7
    _C.TRAIN.MIN_LR = 5e-6
    _C.TRAIN.CLIP_GRAD = 5.0
    _C.TRAIN.AUTO_RESUME = False
    _C.TRAIN.BEST_RESUME = True
    _C.TRAIN.ACCUMULATION_STEPS = 1
    _C.TRAIN.FUSED_STEPS = 1       # K optimizer steps per device dispatch (lax.scan)
    _C.TRAIN.USE_CHECKPOINT = False        # activation remat (jax.checkpoint)
    _C.TRAIN.REMAT_STAGES = []     # stage indices to remat when USE_CHECKPOINT;
    #                                [] = all stages. Skipping the cheap stages'
    #                                low-util recompute (16-26% MXU, r4 profile)
    #                                trades HBM for step time: [2] measured
    #                                74.44 vs 73.60 img/s on the 448 bench
    _C.TRAIN.TEXT_REMAT = "auto"   # e2e only — remat the RoBERTa layers:
    #                                "auto" = follow USE_CHECKPOINT, "on",
    #                                "off" (text activations at e2e batch
    #                                sizes are small; skipping the bwd
    #                                re-forward is step-time win if HBM fits)
    _C.TRAIN.FUSED_MLP = False     # Pallas fused MLP+LN block half (TPU only;
    #                                ops/fused_dense.py mlp_ln, stages C<=512)
    _C.TRAIN.WINDOW_RESIDENT = False   # keep activations in window layout
    #                                between consecutive blocks (TPU/Pallas
    #                                path only): skips the window_reverse →
    #                                window_partition round trip on the
    #                                unshifted→shifted block pairs. Measured
    #                                75.66 vs 74.44 img/s on the 448 bench
    #                                with FUSED_MLP + REMAT_STAGES [2].
    _C.TRAIN.EARLY_STOP_PATIENCE = 50      # fusion default (main_bigvul.py early stop)
    _C.TRAIN.BEST_SAVE = "full"    # what the best-F1 snapshot/checkpoint holds:
    #                                "full" = params + optimizer moments +
    #                                batch_stats (reference semantics,
    #                                utils.py:143-176, resumable from best);
    #                                "params" = params + batch_stats only —
    #                                ~3x cheaper host fetch per improvement
    #                                over the TPU relay (the e2e 220M-param
    #                                full state is a ~2.6 GB transfer)
    _C.TRAIN.DEVICE_DATA = False   # keep the full TRAIN split device-resident
    #                                (images in the compute dtype) and ship
    #                                only int32 batch indices per step; the
    #                                gather happens inside the jitted step.
    #                                Removes per-step host->device batch
    #                                transfers — essential on the tunneled
    #                                TPU relay, whose client leaks host RAM
    #                                proportional to transferred bytes (a
    #                                30-epoch 2400-function e2e run leaked
    #                                130 GB and was host-OOM-killed), and
    #                                idiomatic on TPU regardless (the 1-core
    #                                host stops being the feed bottleneck).
    #                                Costs HBM: the train split must fit
    #                                next to the model + optimizer.
    _C.TRAIN.DEVICE_EVAL = False   # same residency for the VAL/TEST splits:
    #                                eval batches become int32 index vectors
    #                                gathered on device (make_eval_step
    #                                indexed=True). Together with DEVICE_DATA
    #                                this makes long runs transfer-free after
    #                                the one-time corpus upload (eval was the
    #                                residual ~0.6 GB/epoch of relay-leaking
    #                                host→device traffic).
    _C.TRAIN.BEST_FETCH = "sync"   # "async": a val-F1 improvement starts a
    #                                copy_to_host_async of the snapshot leaves
    #                                and returns immediately — the D2H overlaps
    #                                the next epoch's compute, and the best
    #                                checkpoint is written lazily (replaced by
    #                                the next improvement, finalized at loop
    #                                end). Costs one extra device-resident
    #                                params(+opt) copy until replaced — keep
    #                                "sync" when HBM is tight.
    _C.TRAIN.DATA_PATH = "datasets/total/train_balanced.txt"
    _C.TRAIN.LR_SCHEDULER = CfgNode()
    _C.TRAIN.LR_SCHEDULER.NAME = "cosine"
    _C.TRAIN.LR_SCHEDULER.DECAY_EPOCHS = 30
    _C.TRAIN.LR_SCHEDULER.DECAY_RATE = 0.1
    _C.TRAIN.OPTIMIZER = CfgNode()
    _C.TRAIN.OPTIMIZER.NAME = "adamw"
    _C.TRAIN.OPTIMIZER.EPS = 1e-8
    _C.TRAIN.OPTIMIZER.BETAS = (0.9, 0.999)
    _C.TRAIN.OPTIMIZER.MOMENTUM = 0.9
    _C.TRAIN.MOE = CfgNode()
    _C.TRAIN.MOE.SAVE_MASTER = False

    # ------------------------------------------------------------------- aug
    _C.AUG = CfgNode()
    _C.AUG.COLOR_JITTER = 0.4
    _C.AUG.AUTO_AUGMENT = "rand-m9-mstd0.5-inc1"
    _C.AUG.REPROB = 0.25
    _C.AUG.REMODE = "pixel"
    _C.AUG.RECOUNT = 1
    _C.AUG.MIXUP = 0.8
    _C.AUG.CUTMIX = 1.0
    _C.AUG.CUTMIX_MINMAX = None
    _C.AUG.MIXUP_PROB = 1.0
    _C.AUG.MIXUP_SWITCH_PROB = 0.5
    _C.AUG.MIXUP_MODE = "batch"

    # ------------------------------------------------------------- test/val
    _C.TEST = CfgNode()
    _C.TEST.CROP = False
    _C.TEST.SEQUENTIAL = False
    _C.TEST.SHUFFLE = False
    _C.TEST.DATA_PATH = "datasets/total/test.txt"
    _C.VAL = CfgNode()
    _C.VAL.DATA_PATH = "datasets/total/valid.txt"

    # ------------------------------------------------------------- parallel
    # TPU mesh description (new). DP shards the batch over ICI; MP is reserved
    # for tensor-parallel sharding of the encoders (SURVEY §2.5 TPU mapping).
    _C.PARALLEL = CfgNode()
    _C.PARALLEL.DP = -1                    # -1: use all available devices
    _C.PARALLEL.MP = 1
    _C.PARALLEL.DTYPE = "bfloat16"         # compute dtype on the MXU
    _C.PARALLEL.PARAM_DTYPE = "float32"    # master params
    _C.PARALLEL.PP = 1                     # pipeline stages for the text
    #                                        encoder (parallel/pipeline.py
    #                                        gpipe; 1 = off). PP>1 replaces
    #                                        the dp mesh in train_text — the
    #                                        layer stack is partitioned over
    #                                        a "pp" mesh axis instead
    _C.PARALLEL.PP_MICROBATCHES = 4        # microbatches streamed through
    #                                        the pipeline per step

    # ----------------------------------------------------------------- misc
    _C.AMP_ENABLE = True                   # accepted for YAML compat → bf16 policy
    _C.AMP_OPT_LEVEL = ""
    _C.OUTPUT = "output"
    _C.MULTI_OUTPUT = "myoutput/multi_defect_new_gcn"
    _C.TAG = "default"
    _C.SAVE_FREQ = 1
    _C.PRINT_FREQ = 50
    _C.SEED = 0
    _C.EVAL_MODE = False
    _C.THROUGHPUT_MODE = False
    _C.LOCAL_RANK = 0
    return _C


def get_config(args: Any = None) -> CfgNode:
    """Build a config from defaults + optional YAML + CLI overrides.

    ``args`` is any object with optional attributes ``cfg`` (YAML path),
    ``opts`` (KEY VALUE list), ``batch_size``, ``data_path``, ``resume``,
    ``tag``, ``eval``, ``throughput``, ``output``, ``pretrained`` — the same
    override surface as the reference's update_config (mvuld/config.py:339-390).
    """
    cfg = default_config()
    if args is None:
        cfg.freeze()
        return cfg
    if getattr(args, "cfg", None):
        cfg.merge_from_file(args.cfg)
    if getattr(args, "opts", None):
        cfg.merge_from_list(args.opts)
    if getattr(args, "batch_size", None):
        cfg.DATA.BATCH_SIZE = args.batch_size
    if getattr(args, "data_path", None):
        cfg.DATA.DATA_PATH = args.data_path
    if getattr(args, "pretrained", None):
        cfg.MODEL.PRETRAINED = args.pretrained
    if getattr(args, "resume", None):
        cfg.MODEL.RESUME = args.resume
    if getattr(args, "tag", None):
        cfg.TAG = args.tag
    if getattr(args, "eval", False):
        cfg.EVAL_MODE = True
    if getattr(args, "throughput", False):
        cfg.THROUGHPUT_MODE = True
    if getattr(args, "output", None):
        cfg.OUTPUT = args.output
    cfg.OUTPUT = os.path.join(cfg.OUTPUT, cfg.MODEL.NAME, cfg.TAG)
    cfg.freeze()
    return cfg


def save_config(cfg: CfgNode, output_dir: str) -> str:
    """Dump the fully-resolved config to ``{output_dir}/config.json``.

    The reference dumps its merged config on rank 0 before training
    (mvuld/main.py:504-508); here the dump also serves the serving path —
    ``train.predict`` rebuilds the exact model/data dims of a finished run
    from this file instead of asking the user to repeat every --opts."""
    import json

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "config.json")
    with open(path, "w") as f:
        json.dump(cfg.to_dict(), f, indent=1, default=str)
    return path


def load_saved_config(path: str) -> CfgNode:
    """Rebuild a frozen config from a run directory (or its config.json)."""
    import json

    if os.path.isdir(path):
        path = os.path.join(path, "config.json")
    cfg = default_config()
    with open(path) as f:
        cfg.merge_from_other_cfg(json.load(f))
    cfg.freeze()
    return cfg
