"""vst.perceptual — frozen feature extractors for perceptual losses."""

from vst.perceptual.vgg import (
    Vgg16Features,
    Vgg19Features,
    CaffeVGG,
    vgg16_params_from_torch,
    vgg19_params_from_torch,
    caffe_vgg_params_from_torch,
    obst_prep,
    obst_postp,
)

__all__ = [
    "Vgg16Features",
    "Vgg19Features",
    "CaffeVGG",
    "vgg16_params_from_torch",
    "vgg19_params_from_torch",
    "caffe_vgg_params_from_torch",
    "obst_prep",
    "obst_postp",
]
