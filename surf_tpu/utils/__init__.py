from .tools import to_device, tensor2float, save_scalars, DictAverageMeter, setup_seed
from .scheduler import warmup_cosine
from .checkpoint import save_checkpoint, load_checkpoint, to_jax
