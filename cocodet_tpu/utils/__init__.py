from .checkpoint import load_checkpoint, load_matched, save_checkpoint
from .ema import EMAState, ema_init, ema_update
from .logger import logger, setup_logger
from .lr_scheduler import build_lr_schedule
from .metric import AverageMeter, MeterBuffer, Timer, device_mem_usage_mb
