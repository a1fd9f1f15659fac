from lidog_tpu.losses.losses import (  # noqa: F401
    CELoss,
    DICELoss,
    FocalLoss,
    IWLoss,
    IRWLoss,
    SoftCELoss,
    SoftDICELoss,
    SoftLabelDICELoss,
    get_loss,
)
