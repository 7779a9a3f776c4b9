from . import basic, regularizers
from .basic import get_pixel_criterion
from .gan import AdversarialLoss, build_adversarial, gan_loss
from .generator_loss import GeneratorLoss, build_loss_list, filter_selectors
from .ssim import ms_ssim, ms_ssim_loss, ssim, ssim_loss

__all__ = [
    "basic", "regularizers", "get_pixel_criterion",
    "AdversarialLoss", "build_adversarial", "gan_loss",
    "GeneratorLoss", "build_loss_list", "filter_selectors",
    "ms_ssim", "ms_ssim_loss", "ssim", "ssim_loss",
]
