from .heads import (AvatarConfig, init_avatar_rgb, init_avatar_3dmm,  # noqa: F401
                    init_avatar_audio, rgb_forward, t3dmm_forward,
                    audio_forward, get_latent, get_image)
