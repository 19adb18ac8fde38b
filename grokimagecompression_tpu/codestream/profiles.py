"""Profile enforcement: Digital Cinema, Broadcast, IMF.

Analog of the reference profile layer (reference:
src/lib/jp2/codestream/j2kprofile.cpp set_cinema_parameters:941,
set_broadcast_parameters:644, set_imf_parameters:121): a profile REWRITES
the encoder parameter set (tiling, code-block size, precincts,
progression, transform, layers) and imposes hard codestream byte caps.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from ..core.params import EncoderParams, Progression, Transform

# Rsiz profile codes (ISO/IEC 15444-1 and AMDs; same values as the
# reference, grok.h:157-168).
PROFILE_NONE = 0x0000
PROFILE_0 = 0x0001
PROFILE_1 = 0x0002
PROFILE_CINEMA_2K = 0x0003
PROFILE_CINEMA_4K = 0x0004
PROFILE_BC_SINGLE = 0x0100
PROFILE_BC_MULTI = 0x0200
PROFILE_BC_MULTI_R = 0x0300
PROFILE_IMF_2K = 0x0400
PROFILE_IMF_4K = 0x0500
PROFILE_IMF_8K = 0x0600

# Cinema rate ceilings in codestream bytes per frame (grok.h:316-319).
CINEMA_24_CS = 1_302_083
CINEMA_48_CS = 651_041
CINEMA_24_COMP = 1_041_666
CINEMA_48_COMP = 520_833


@dataclasses.dataclass
class ProfiledParams:
    params: EncoderParams
    rsiz: int
    max_cs_bytes: int = 0       # 0 = no cap
    max_comp_bytes: int = 0
    warnings: Tuple[str, ...] = ()


def apply_cinema(params: EncoderParams, image, fps: int = 24,
                 four_k: bool = False) -> ProfiledParams:
    """Force Digital Cinema 2K/4K constraints (single tile, 32x32
    code-blocks, 9/7, CPRL, 256 precincts, one layer, frame byte cap)."""
    warnings = []
    numres = params.numresolutions
    if four_k:
        numres = min(max(numres, 2), 7)
    elif numres > 6:
        warnings.append("cinema 2K: resolutions clamped to 6")
        numres = 6
    if params.numlayers > 1:
        warnings.append("cinema: layers forced to 1")
    pocs = ()
    if four_k:
        # 4K: two POC volumes — all but the top resolution, then the top
        # (reference: j2kprofile.cpp initialise_4K_poc).
        from .markers import PocEntry
        pocs = (
            PocEntry(rs=0, cs=0, lye=1, re=numres - 1, ce=3,
                     prog=Progression.CPRL),
            PocEntry(rs=numres - 1, cs=0, lye=1, re=numres, ce=3,
                     prog=Progression.CPRL),
        )
    new = dataclasses.replace(
        params,
        tile_size=None,
        tile_offset=(0, 0),
        image_offset=(0, 0),
        cblk_w_exp=5, cblk_h_exp=5,           # 32x32
        cblk_style=0,
        transform=Transform.DWT_97,
        numresolutions=numres,
        numlayers=1,
        rates=(),
        quality_psnr=(),
        progression=Progression.CPRL,
        precincts=tuple((8, 8) for _ in range(numres)),  # 256x256
        pocs=pocs,
        tlm_markers=True,
    )
    cap = CINEMA_24_CS if fps <= 24 else CINEMA_48_CS
    comp_cap = CINEMA_24_COMP if fps <= 24 else CINEMA_48_COMP
    return ProfiledParams(
        params=new,
        rsiz=PROFILE_CINEMA_4K if four_k else PROFILE_CINEMA_2K,
        max_cs_bytes=cap,
        max_comp_bytes=comp_cap,
        warnings=tuple(warnings),
    )


def apply_broadcast(params: EncoderParams, image, level: int = 1,
                    multi: bool = False) -> ProfiledParams:
    """Broadcast profile: single/multi tile, 32x32 blocks, <=5 levels."""
    new = dataclasses.replace(
        params,
        cblk_w_exp=5, cblk_h_exp=5,
        cblk_style=0,
        numresolutions=min(params.numresolutions, 6),
        numlayers=1,
        tile_offset=(0, 0),
        image_offset=(0, 0),
    )
    rsiz = (PROFILE_BC_MULTI if multi else PROFILE_BC_SINGLE) | \
        (level & 0xF)
    return ProfiledParams(params=new, rsiz=rsiz)


def apply_imf(params: EncoderParams, image, variant: str = "2k",
              mainlevel: int = 1, sublevel: int = 1) -> ProfiledParams:
    """IMF profile: single tile, 32x32 blocks, reversible or 9/7,
    precincts, <= 7 levels (4k/8k scale with the variant)."""
    base = {"2k": PROFILE_IMF_2K, "4k": PROFILE_IMF_4K,
            "8k": PROFILE_IMF_8K}[variant]
    max_res = {"2k": 6, "4k": 7, "8k": 8}[variant]
    numres = min(params.numresolutions, max_res)
    new = dataclasses.replace(
        params,
        tile_size=None,
        tile_offset=(0, 0),
        image_offset=(0, 0),
        cblk_w_exp=5, cblk_h_exp=5,
        cblk_style=0,
        numresolutions=numres,
        precincts=tuple((8, 8) for _ in range(numres)),
    )
    rsiz = base | ((mainlevel & 0xF)) | ((sublevel & 0xF) << 4)
    return ProfiledParams(params=new, rsiz=rsiz)


def encode_with_profile(image, profiled: ProfiledParams) -> bytes:
    """Encode applying the profile's rsiz and byte caps."""
    from . import encoder as enc_mod
    from .pcrd import PCRDAllocator

    params = profiled.params
    layer_alloc = None
    if profiled.max_cs_bytes:
        # Absolute codestream byte budget via PCRD (headers are small
        # relative to the cap; subtract a conservative 1 KiB).
        budget = max(1, profiled.max_cs_bytes - 1024)
        layer_alloc = PCRDAllocator(
            rates=(1.0,), image_bytes=budget,
            max_abs_bytes=budget,
            max_comp_bytes=profiled.max_comp_bytes)
    cs = enc_mod.encode(image, params, layer_alloc=layer_alloc,
                        rsiz=profiled.rsiz)
    return cs
