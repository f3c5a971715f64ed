from .losses_fn import melspec_loss_fn, prior_loss_fn, neg_sdsdr, sdr_loss, cal_sdr
from .gan import gen_loss, disc_loss
from ..diffusion.gaussian import GaussianDiffusion1D
