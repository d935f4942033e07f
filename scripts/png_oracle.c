/* Tiny libpng (simplified png_image API) shim used ONLY as a test
 * oracle (built on demand by tests/test_png_libpng_oracle.py when
 * gcc + png.h exist; the repo never ships the binary).
 *
 *   png_oracle enc <w> <h> <ncomp> <in.raw> <out.png>
 *   png_oracle dec <in.png> <out.raw>     (prints "w h ncomp")
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <png.h>

static unsigned char *read_all(const char *path, long *n) {
    FILE *f = fopen(path, "rb");
    if (!f) { perror(path); exit(2); }
    fseek(f, 0, SEEK_END); *n = ftell(f); fseek(f, 0, SEEK_SET);
    unsigned char *buf = malloc(*n);
    if (fread(buf, 1, *n, f) != (size_t)*n) { perror("fread"); exit(2); }
    fclose(f);
    return buf;
}

int main(int argc, char **argv) {
    if (argc >= 6 && !strcmp(argv[1], "enc")) {
        int w = atoi(argv[2]), h = atoi(argv[3]), nc = atoi(argv[4]);
        long n; unsigned char *raw = read_all(argv[5], &n);
        if (n != (long)w * h * nc) { fprintf(stderr, "bad raw\n"); return 2; }
        png_image im;
        memset(&im, 0, sizeof im);
        im.version = PNG_IMAGE_VERSION;
        im.width = w; im.height = h;
        im.format = nc == 1 ? PNG_FORMAT_GRAY
                  : nc == 3 ? PNG_FORMAT_RGB : PNG_FORMAT_RGBA;
        if (!png_image_write_to_file(&im, argv[6], 0, raw, 0, NULL)) {
            fprintf(stderr, "png write: %s\n", im.message); return 2;
        }
        return 0;
    }
    if (argc >= 4 && !strcmp(argv[1], "dec")) {
        png_image im;
        memset(&im, 0, sizeof im);
        im.version = PNG_IMAGE_VERSION;
        if (!png_image_begin_read_from_file(&im, argv[2])) {
            fprintf(stderr, "png read: %s\n", im.message); return 2;
        }
        int nc = PNG_IMAGE_SAMPLE_CHANNELS(im.format);
        /* normalize to 8-bit in the channel count the file reports */
        size_t sz = PNG_IMAGE_SIZE(im);
        unsigned char *out = malloc(sz);
        if (!png_image_finish_read(&im, NULL, out, 0, NULL)) {
            fprintf(stderr, "png finish: %s\n", im.message); return 2;
        }
        FILE *f = fopen(argv[3], "wb");
        fwrite(out, 1, sz, f);
        fclose(f);
        printf("%u %u %d\n", im.width, im.height, nc);
        return 0;
    }
    fprintf(stderr, "usage: enc w h nc in.raw out.png | dec in.png out.raw\n");
    return 1;
}
