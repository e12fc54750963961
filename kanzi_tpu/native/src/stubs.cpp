// Temporary stubs for codecs still under construction; each throws so the
// Python layer can surface a clear error. Removed as implementations land.

#include "kz.h"

namespace kz {

#define KZ_STUB(sig) \
    sig { throw Error("not implemented yet"); }

KZ_STUB(void ansEncode(OBS&, const u8*, i64, int))
KZ_STUB(void ansDecode(IBS&, u8*, i64, int, int))
KZ_STUB(void rangeEncode(OBS&, const u8*, i64))
KZ_STUB(void rangeDecode(IBS&, u8*, i64, int))
KZ_STUB(void fpaqEncode(OBS&, const u8*, i64))
KZ_STUB(void fpaqDecode(IBS&, u8*, i64, int))
KZ_STUB(void binaryEncode(OBS&, const u8*, i64, int, const Ctx&))
KZ_STUB(void binaryDecode(IBS&, u8*, i64, int, const Ctx&))

int transformForward(int, const u8*, i32, u8*, i64, Ctx&, i32*) {
    return -2;  // unknown transform
}

int transformInverse(int, const u8*, i32, u8*, i64, Ctx&, i32*) {
    return -2;
}

}  // namespace kz
