"""Round-4 demo: real-TPU MLM pretrain of the PROMOTED headline family —
Mamba-2 (SSD) with the fused-conv head-batched Pallas kernels — through
the full production path (native C++ loader, EMA, eval, checkpoint) +
mid-run resume. Companion to scripts/demo_pretrain_tpu.py (v1, r2)."""
import os, sys, json

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np, jax, jax.numpy as jnp

from caduceus_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from caduceus_tpu.config import CaduceusConfig, SSMConfig
from caduceus_tpu.data.hg38 import HG38DataModule
from caduceus_tpu.data.synthetic import make_synthetic_genome
from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
from caduceus_tpu.tokenization import CaduceusTokenizer
from caduceus_tpu.train.trainer import Trainer, TrainerConfig
from caduceus_tpu.utils.logging import make_logger, param_count

RUN = "runs/demo_r4_pretrain_v2"
gen_dir = "/tmp/demo_r4_genome"
fasta, bed = make_synthetic_genome(gen_dir, n_chromosomes=4,
                                   chrom_len=1 << 21, window=1 << 14)
dm = HG38DataModule(bed, fasta, max_length=4096, batch_size=64, mlm=True,
                    use_native=True, seed=0)
tok = CaduceusTokenizer()
cfg = CaduceusConfig(
    d_model=256, n_layer=8, vocab_size=tok.vocab_size,
    ssm_cfg=SSMConfig(version=2, d_state=128, headdim=64, ngroups=1,
                      ssd_chunk_size=128, ssd_seg_chunks=8),
    rcps=True, complement_map=tok.complement_map, dtype="bfloat16",
    residual_in_fp32=False, remat=True)
os.makedirs(RUN, exist_ok=True)
cfg.save(os.path.join(RUN, "model_config.json"))
model = CaduceusForMaskedLM(cfg)
steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
tcfg = TrainerConfig(
    max_steps=steps, run_dir=RUN, lr=8e-3, accum_steps=2, ema_decay=0.999,
    log_every=1, prefetch=0,  # serialized stream: idle transfers (tunnel)
    eval_every=100, eval_batches=4, checkpoint_every=100,
)
log = make_logger(run_dir=RUN, rank=0)
tl = dm.train_loader()
trainer = Trainer(model, tcfg, tl, dm.eval_loader("valid"),
                  ignore_index=tok.pad_token_id, log_fn=log)
trainer.init_state(next(iter(tl)))
log(param_count(trainer.state.params))
resumed = trainer.restore_checkpoint()
log({"resumed": bool(resumed)})
metrics = trainer.fit()
trainer.save_checkpoint()
print(json.dumps({"final": metrics}))
