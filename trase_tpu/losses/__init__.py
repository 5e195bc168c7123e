from . import contrastive, image_losses, losses_3d, style  # noqa: F401
from .contrastive import (  # noqa: F401
    negative_pixel_pair_loss,
    positive_pixel_pair_loss,
)
from .image_losses import l1_loss, l2_loss, masked_l1_loss, ssim  # noqa: F401
