/* Secure zeroization shim — the TPU build's analogue of the reference's
 * only native component (Sources/CUtil/zeroize.c:1-24): a memset the
 * compiler cannot elide, used to scrub secret key material. */

#include <stddef.h>
#include <string.h>

void she_tpu_zeroize(void *ptr, size_t size) {
    memset(ptr, 0, size);
    /* Compiler barrier: force the memset to be observable. */
    __asm__ __volatile__("" : : "r"(ptr) : "memory");
}
