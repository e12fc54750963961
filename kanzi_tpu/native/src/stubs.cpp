// Temporary stubs for codecs still under construction; each throws so the
// Python layer can surface a clear error. Removed as implementations land.

#include "kz.h"

namespace kz {

#define KZ_STUB(sig) \
    sig { throw Error("not implemented yet"); }


#define KZ_TSTUB(name) \
    int name(const u8*, i32, u8*, i64, Ctx&, i32*) { return -2; }
#define KZ_TSTUB2(name) \
    int name(const u8*, i32, u8*, i64, i32*) { return -2; }






}  // namespace kz
