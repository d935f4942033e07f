/* Tiny libjpeg shim used ONLY as a test oracle (built on demand by
 * tests/test_jpeg_libjpeg_oracle.py when gcc + jpeglib.h exist; the
 * repo never ships or requires the binary).
 *
 *   jpeg_oracle enc <w> <h> <ncomp> <quality> <subsamp> <in.raw> <out.jpg> [prog [dri]]
 *       subsamp: 444 | 422 | 420 (ignored for ncomp=1)
 *   jpeg_oracle dec <in.jpg> <out.raw>
 *       prints "w h ncomp" on stdout; fancy upsampling is DISABLED so
 *       chroma comes back as box replication — the same rule the
 *       from-scratch decoder uses (the spec leaves the upsampling
 *       filter to the decoder).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *read_all(const char *path, long *n) {
    FILE *f = fopen(path, "rb");
    if (!f) { perror(path); exit(2); }
    fseek(f, 0, SEEK_END); *n = ftell(f); fseek(f, 0, SEEK_SET);
    unsigned char *buf = malloc(*n);
    if (fread(buf, 1, *n, f) != (size_t)*n) { perror("fread"); exit(2); }
    fclose(f);
    return buf;
}

static int do_enc(int argc, char **argv) {
    int w = atoi(argv[2]), h = atoi(argv[3]), nc = atoi(argv[4]);
    int q = atoi(argv[5]);
    const char *sub = argv[6];
    long n; unsigned char *raw = read_all(argv[7], &n);
    if (n != (long)w * h * nc) { fprintf(stderr, "bad raw size\n"); return 2; }
    FILE *out = fopen(argv[8], "wb");
    if (!out) { perror(argv[8]); return 2; }

    struct jpeg_compress_struct c;
    struct jpeg_error_mgr err;
    c.err = jpeg_std_error(&err);
    jpeg_create_compress(&c);
    jpeg_stdio_dest(&c, out);
    c.image_width = w; c.image_height = h;
    c.input_components = nc;
    c.in_color_space = nc == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, q, TRUE);
    if (nc == 3) {
        int hs = 1, vs = 1;
        if (!strcmp(sub, "422")) { hs = 2; vs = 1; }
        if (!strcmp(sub, "420")) { hs = 2; vs = 2; }
        c.comp_info[0].h_samp_factor = hs;
        c.comp_info[0].v_samp_factor = vs;
        c.comp_info[1].h_samp_factor = 1;
        c.comp_info[1].v_samp_factor = 1;
        c.comp_info[2].h_samp_factor = 1;
        c.comp_info[2].v_samp_factor = 1;
    }
    if (argc > 9 && !strcmp(argv[9], "prog"))
        jpeg_simple_progression(&c);   /* the standard 10-scan script */
    if (argc > 10) c.restart_interval = atoi(argv[10]);
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
        JSAMPROW row = raw + (long)c.next_scanline * w * nc;
        jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    jpeg_destroy_compress(&c);
    fclose(out);
    return 0;
}

static int do_dec(int argc, char **argv) {
    long n; unsigned char *buf = read_all(argv[2], &n);
    struct jpeg_decompress_struct d;
    struct jpeg_error_mgr err;
    d.err = jpeg_std_error(&err);
    jpeg_create_decompress(&d);
    jpeg_mem_src(&d, buf, n);
    jpeg_read_header(&d, TRUE);
    d.do_fancy_upsampling = FALSE;   /* box replication, like ours */
    jpeg_start_decompress(&d);
    int w = d.output_width, h = d.output_height, nc = d.output_components;
    unsigned char *out = malloc((long)w * h * nc);
    while ((int)d.output_scanline < h) {
        JSAMPROW row = out + (long)d.output_scanline * w * nc;
        jpeg_read_scanlines(&d, &row, 1);
    }
    jpeg_finish_decompress(&d);
    jpeg_destroy_decompress(&d);
    FILE *f = fopen(argv[3], "wb");
    fwrite(out, 1, (long)w * h * nc, f);
    fclose(f);
    printf("%d %d %d\n", w, h, nc);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 9 && !strcmp(argv[1], "enc")) return do_enc(argc, argv);
    if (argc >= 4 && !strcmp(argv[1], "dec")) return do_dec(argc, argv);
    fprintf(stderr, "usage: enc w h ncomp q subsamp in.raw out.jpg | "
                    "dec in.jpg out.raw\n");
    return 1;
}
