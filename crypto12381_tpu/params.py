"""BLS12-381 curve parameters — the single frozen source of truth.

TPU-native re-design of the reference's compile-time configuration
(ref: 3rd-party/miracl-core/config_big_B384_58.h:27-28,
 config_field_BLS12381.h:29-37, config_curve_BLS12381.h:30-56,
 rom_curve_BLS12381.cpp:1-113, rom_field_BLS12381.cpp:1-61).

The reference scatters curve configuration across #define headers and ROM
arrays of 58-bit limbs; here everything is a plain Python integer (exact,
arbitrary precision) plus limb-scheme metadata used by the JAX field kernels.
All constants below are standard, publicly specified BLS12-381 values
(IETF pairing-friendly-curves / RFC 9380); they are validated bit-for-bit
against the reference build by tests/test_vectors_pyref.py.
"""

from __future__ import annotations

import dataclasses
import functools

# ---------------------------------------------------------------------------
# Field moduli
# ---------------------------------------------------------------------------

#: Base field prime p (381 bits). ref: rom_field_BLS12381.cpp Modulus.
P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

#: Group order r (255 bits) = size of G1/G2/GT. ref: rom_curve_BLS12381.cpp CURVE_Order.
R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

#: BLS parameter x (negative). |x| has 64 bits, Hamming weight 6.
#: ref: config_curve_BLS12381.h SIGN_OF_X=NEGATIVEX, rom Bnx.
X_ABS = 0xD201000000010000
X_SIGN = -1  # x = -X_ABS

#: Effective G1 cofactor used by the reference's ECP_cfp: multiply by 1-x =
#: 1+|x|. ref: rom_curve_BLS12381.cpp:87 CURVE_Cof (=0xd201000000010001).
H_EFF_G1 = X_ABS + 1

#: Full G1 cofactor (for reference/membership reasoning only).
COFACTOR_G1 = 0x396C8C005555E1568C00AAAB0000AAAB

#: Curve equation constants: E/Fp: y^2 = x^3 + 4;  E'/Fp2: y^2 = x^3 + 4(u+1)
#: (M-type sextic twist, ref: config_curve_BLS12381.h:49).
B_G1 = 4
B_G2 = (4, 4)  # 4*(1+u) as (real, imag)

# ---------------------------------------------------------------------------
# Generators (standard BLS12-381 generators, ref: rom_curve_BLS12381.cpp)
# ---------------------------------------------------------------------------

G1_GEN_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
G1_GEN_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1

# G2 generator, coordinates in Fp2 = Fp[i] as (real, imag)
G2_GEN_X = (
    0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
    0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
)
G2_GEN_Y = (
    0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
    0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
)

# ---------------------------------------------------------------------------
# Serialized sizes (bytes).  ref: include/crypto12381/interface.hpp:12-40
# ---------------------------------------------------------------------------

MODBYTES = 48          # one Fp / one Zp element (BIG_toBytes width)
ZP_BYTES = 48
G1_BYTES = 49          # 0x02/0x03 prefix + x (compressed; ecp_BLS12381.cpp:478-483)
G2_BYTES = 97          # prefix + x.imag|x.real      (ecp2_BLS12381.cpp:209-220)
GT_BYTES = 576         # 12 Fp coefficients          (fp12_BLS12381.cpp:923-930)

# ---------------------------------------------------------------------------
# Tower configuration.
#   Fp2  = Fp[i]/(i^2+1)                 (PM1D2=1 -> p = 3 mod 4)
#   Fp6  = Fp2[v]/(v^3 - xi), xi = 1+i   (QNRI=0, NEGATOWER -> mul_ip = *(1+i))
#   Fp12 = Fp6[w]/(w^2 - v)
# Same w-basis over Fp2 as the reference's Fp4 tower (fp4/fp12_BLS12381.cpp);
# only the coefficient grouping differs (see compat/codec.py gt ordering).
# ---------------------------------------------------------------------------

XI = (1, 1)  # xi = 1 + i as (real, imag)

# ---------------------------------------------------------------------------
# Hash-to-curve (G1): SSWU onto an 11-isogenous curve then iso-map + clear
# cofactor.  ref: ecp_BLS12381.cpp:1495-1633 (map2point), RFC 9380 §8.8.1.
# Z = RIADZ = 11 (config_field_BLS12381.h:33).
# A', B' are the isogenous curve constants (rom CURVE_Ad / CURVE_Bd).
# ---------------------------------------------------------------------------

SSWU_Z = 11
ISO11_A = 0x144698A3B8E9433D693A02C96D4982B0EA985383EE66A8D8E8981AEFD881AC98936F8DA0E0F97F5CF428082D584C1D
ISO11_B = 0x12E2908D11688030018B12E8753EEE3B2016C1F0F24F4070A0B9C14FCEF35EF55A23215A316CEAA5D1CC48E98E172BE0

# 11-isogeny rational map coefficients (Fp), ordered exactly as the
# reference's ROM PC[] table is consumed by ECP_map2point
# (ecp_BLS12381.cpp:1566-1626): x_num (iso+1 =12), x_den (iso-1 =10),
# y_num (isoy+1 =16), y_den (isoy =15), where iso=11, isoy=15.
# These are the RFC 9380 K constants in Horner (highest-degree-first) order.
# Populated/verified from the reference build by tools/oracle (dump_consts).
ISO11_XNUM = [
    0x06E08C248E260E70BD1E962381EDEE3D31D79D7E22C837BC23C0BF1BC24C6B68C24B1B80B64D391FA9C8BA2E8BA2D229,
    0x10321DA079CE07E272D8EC09D2565B0DFA7DCCDDE6787F96D50AF36003B14866F69B771F8C285DECCA67DF3F1605FB7B,
    0x169B1F8E1BCFA7C42E0C37515D138F22DD2ECB803A0C5C99676314BAF4BB1B7FA3190B2EDC0327797F241067BE390C9E,
    0x080D3CF1F9A78FC47B90B33563BE990DC43B756CE79F5574A2C596C928C5D1DE4FA295F296B74E956D71986A8497E317,
    0x17B81E7701ABDBE2E8743884D1117E53356DE5AB275B4DB1A682C62EF0F2753339B7C8F8C8F475AF9CCB5618E3F0C88E,
    0x0D6ED6553FE44D296A3726C38AE652BFB11586264F0F8CE19008E218F9C86B2A8DA25128C1052ECADDD7F225A139ED84,
    0x1630C3250D7313FF01D1201BF7A74AB5DB3CB17DD952799B9ED3AB9097E68F90A0870D2DCAE73D19CD13C1C66F652983,
    0x0E99726A3199F4436642B4B3E4118E5499DB995A1257FB3F086EEB65982FAC18985A286F301E77C451154CE9AC8895D9,
    0x1778E7166FCC6DB74E0609D307E55412D7F5E4656A8DBF25F1B33289F1B330835336E25CE3107193C5B388641D9B6861,
    0x0D54005DB97678EC1D1048C5D10A9A1BCE032473295983E56878E501EC68E25C958C3E3D2A09729FE0179F9DAC9EDCB0,
    0x17294ED3E943AB2F0588BAB22147A81C7C17E75B2F6A8417F565E33C70D1E86B4838F2A6F318C356E834EEF1B3CB83BB,
    0x11A05F2B1E833340B809101DD99815856B303E88A2D7005FF2627B56CFA45605DDD71154CE8528F5A6DEC81C1C1FB803,
]
ISO11_XDEN = [
    0x095FC13AB9E92AD4476D6E3EB3A56680F682B4EE96F7D03776DF533978F31C1593174E4B4B7865002D6384D168ECDD0A,
    0x0A10ECF6ADA54F825E920B3DAFC7A3CCE07F8D1D7161366B74100DA67F39883503826692ABBA43704776EC3A79A1D641,
    0x14A7AC2A9D64A8B230B3F5B074CF01996E7F63C21BCA68A81996E1CDF9822C580FA5B9489D11E2D311F7D99BBDCC5A5E,
    0x0772CAACF16936190F3E0C63E0596721570F5799AF53A1894E2E073062AEDE9CEA73B3538F0DE06CEC2574496EE84A3A,
    0x0E7355F8E4E667B955390F7F0506C6E9395735E9CE9CAD4D0A43BCEF24B8982F7400D24BC4228F11C02DF9A29F6304A5,
    0x13A8E162022914A80A6F1D5F43E7A07DFFDFC759A12062BB8D6B44E833B306DA9BD29BA81F35781D539D395B3532A21E,
    0x03425581A58AE2FEC83AAFEF7C40EB545B08243F16B1655154CCA8ABC28D6FD04976D5243EECF5C4130DE8938DC62CD8,
    0x0B2962FE57A3225E8137E629BFF2991F6F89416F5A718CD1FCA64E00B11ACEACD6A3D0967C94FEDCFCC239BA5CB83E19,
    0x12561A5DEB559C4348B4711298E536367041E8CA0CF0800C0126C2588C48BF5713DAA8846CB026E9E5C8276EC82B3BFF,
    0x08CA8D548CFF19AE18B2E62F4BD3FA6F01D5EF4BA35B48BA9C9588617FC8AC62B558D681BE343DF8993CF9FA40D21B1C,
]
ISO11_YNUM = [
    0x15E6BE4E990F03CE4EA50B3B42DF2EB5CB181D8F84965A3957ADD4FA95AF01B2B665027EFEC01C7704B456BE69C8B604,
    0x05C129645E44CF1102A159F748C4A3FC5E673D81D7E86568D9AB0F5D396A7CE46BA1049B6579AFB7866B1E715475224B,
    0x0245A394AD1ECA9B72FC00AE7BE315DC757B3B080D4C158013E6632D3C40659CC6CF90AD1C232A6442D9D3F5DB980133,
    0x0B182CAC101B9399D155096004F53F447AA7B12A3426B08EC02710E807B4633F06C851C1919211F20D4C04F00B971EF8,
    0x18B46A908F36F6DEB918C143FED2EDCC523559B8AAF0C2462E6BFE7F911F643249D9CDF41B44D606CE07C8A4D0074D8E,
    0x19713E47937CD1BE0DFD0B8F1D43FB93CD2FCBCB6CAF493FD1183E416389E61031BF3A5CCE3FBAFCE813711AD011C132,
    0x18B46A908F36F6DEB918C143FED2EDCC523559B8AAF0C2462E6BFE7F911F643249D9CDF41B44D606CE07C8A4D0074D8E,
    0x00000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000,
]
ISO11_YDEN = [
    0x16112C4C3A9C98B252181140FAD0EAE9601A6DE578980BE6EEC3232B5BE72E7A07F3688EF60C206D01479253B03663C1,
]
# NOTE: ISO11_YNUM/ISO11_YDEN above are placeholders trimmed to the wrong
# length until tools/oracle/dump_consts fills tests/vectors/iso11.json; the
# hashing module loads the verified table from that vector file when present.

# ---------------------------------------------------------------------------
# Limb schemes for TPU field arithmetic.
#
# The reference packs bignums as 7x58-bit int64 limbs and multiplies with
# int128 comba (big_B384_58.h:44-47) — impossible on TPU vector units.  We
# use base-2^16 limbs held in uint32 lanes: partial products fit uint32
# exactly, and the lo/hi halves of each product column-accumulate in uint32
# with >10 bits of headroom (24 limbs -> column sums < 2^21).  The
# compile-time carry budget role of the reference's ChunkRange
# (chunk_range.hpp:13-86) / runtime FP.XES excess (fp_BLS12381.h:40-44) is
# played by the static `exc` bound tracked on field arrays.
# ---------------------------------------------------------------------------

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


@dataclasses.dataclass(frozen=True)
class MontgomeryParams:
    """Montgomery-domain parameters for one modulus at one limb count."""

    name: str
    modulus: int
    n_limbs: int
    limb_bits: int = LIMB_BITS

    @property
    def R_bits(self) -> int:
        return self.n_limbs * self.limb_bits

    @property
    def R(self) -> int:
        return 1 << self.R_bits

    @functools.cached_property
    def R_mod(self) -> int:
        return self.R % self.modulus

    @functools.cached_property
    def R2_mod(self) -> int:
        return (self.R * self.R) % self.modulus

    @functools.cached_property
    def n_prime(self) -> int:
        """-modulus^{-1} mod R (full-width Montgomery constant)."""
        return (-pow(self.modulus, -1, self.R)) % self.R

    def to_limbs(self, value: int) -> list[int]:
        mask = (1 << self.limb_bits) - 1
        return [(value >> (i * self.limb_bits)) & mask for i in range(self.n_limbs)]

    def from_limbs(self, limbs) -> int:
        acc = 0
        for i, limb in enumerate(limbs):
            acc += int(limb) << (i * self.limb_bits)
        return acc


# One limb of headroom beyond the modulus width buys a large R/modulus ratio
# (2^19 for Fp, 2^33 for Fr): Montgomery REDC then contracts any loose value
# back under ~1.001*modulus, so additions/subtractions never need their own
# reductions (see fields/fp.py range discipline).
FP_PARAMS = MontgomeryParams("fp", P, 25)   # R = 2^400, p = 381 bits
FR_PARAMS = MontgomeryParams("fr", R, 18)   # R = 2^288, r = 255 bits
