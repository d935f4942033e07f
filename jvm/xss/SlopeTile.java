package xss;

import java.nio.ByteBuffer;
import java.nio.ByteOrder;
import java.nio.FloatBuffer;
import java.util.Arrays;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.api.java.UDF5;

import scala.collection.Seq;

/**
 * Horn slope over one halo-assembled tile, entirely JVM-side: the
 * per-tile experiment for the stencil family's remaining
 * Python/Arrow overhead (NOTES_r2: kernel ~6% of the core budget,
 * the rest is scan + shuffle + two Arrow crossings -- this path
 * deletes the crossings).
 *
 * Input: the destination tile's strip pieces from the engine's JVM
 * strip emitter (tiled._jvm_messages, radius 1): each piece is
 * (gy0, gx0, sh, sw, transposed, data) in global cell coordinates;
 * float32 or float64 blobs (element size inferred), little-endian
 * row-major -- the numpy layout.  Hot paths use bulk buffer
 * transfers + flat arrays (per-element ByteBuffer reads measured 2x
 * slower end-to-end).
 *
 * Output: [block, __le, __re, __te, __be] blobs of the slope tile in
 * the same element size as the input, NaN domain edges like the
 * Python kernels (missing halo stays NaN in the padded array).
 */
public class SlopeTile
    implements UDF5<Long, Long, Integer, Integer, Seq<Row>, byte[][]> {

  private static final int R = 1;     // slope radius
  private static final int EDGE = 8;  // blob columns, tiled.EDGE

  private static float[] decodeFlat(byte[] data, int n, int isz) {
    float[] out = new float[n];
    ByteBuffer bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN);
    if (isz == 4) {
      bb.asFloatBuffer().get(out);
    } else {
      java.nio.DoubleBuffer db = bb.asDoubleBuffer();
      for (int i = 0; i < n; i++) out[i] = (float) db.get(i);
    }
    return out;
  }

  /** Emit rows [r0, r1) x cols [c0, c1) of the (h, w) flat array. */
  private static byte[] encode(float[] a, int w, int r0, int r1,
                               int c0, int c1, boolean transposed, int isz) {
    int nr = r1 - r0, nc = c1 - c0;
    ByteBuffer bb = ByteBuffer.allocate(nr * nc * isz)
        .order(ByteOrder.LITTLE_ENDIAN);
    if (isz == 4 && !transposed) {
      FloatBuffer fb = bb.asFloatBuffer();
      for (int i = r0; i < r1; i++) fb.put(a, i * w + c0, nc);
    } else if (!transposed) {
      for (int i = r0; i < r1; i++)
        for (int j = c0; j < c1; j++) bb.putDouble(a[i * w + j]);
    } else if (isz == 4) {
      FloatBuffer fb = bb.asFloatBuffer();
      for (int j = c0; j < c1; j++)
        for (int i = r0; i < r1; i++) fb.put(a[i * w + j]);
    } else {
      for (int j = c0; j < c1; j++)
        for (int i = r0; i < r1; i++) bb.putDouble(a[i * w + j]);
    }
    return bb.array();
  }

  @Override
  public byte[][] call(Long ty, Long tx, Integer th, Integer tw,
                       Seq<Row> pieces) {
    int h = -1, w = -1, isz = 8;
    long oy = ty * th - R, ox = tx * tw - R;
    for (int p = 0; p < pieces.size(); p++) {
      Row piece = pieces.apply(p);
      if (piece.getInt(piece.fieldIndex("iscenter")) == 1) {
        h = piece.getInt(piece.fieldIndex("sh"));
        w = piece.getInt(piece.fieldIndex("sw"));
        byte[] d = (byte[]) piece.get(piece.fieldIndex("data"));
        isz = d.length / (h * w);
      }
    }
    if (h < 0) return null;  // strip-addressed group past the raster edge

    int W = w + 2 * R, H = h + 2 * R;
    float[] pad = new float[H * W];
    Arrays.fill(pad, Float.NaN);

    for (int p = 0; p < pieces.size(); p++) {
      Row piece = pieces.apply(p);
      int sh = piece.getInt(piece.fieldIndex("sh"));
      int sw = piece.getInt(piece.fieldIndex("sw"));
      int tr = piece.getInt(piece.fieldIndex("transposed"));
      long gy0 = piece.getLong(piece.fieldIndex("gy0"));
      long gx0 = piece.getLong(piece.fieldIndex("gx0"));
      byte[] d = (byte[]) piece.get(piece.fieldIndex("data"));
      int pisz = d.length / (sh * sw);
      float[] s = decodeFlat(d, sh * sw, pisz);
      int py0 = (int) (gy0 - oy), px0 = (int) (gx0 - ox);
      if (tr == 0) {  // row-major (sh, sw): bulk row copies
        for (int i = 0; i < sh; i++) {
          int py = py0 + i;
          if (py < 0 || py >= H) continue;
          int j0 = Math.max(0, -px0), j1 = Math.min(sw, W - px0);
          if (j1 > j0)
            System.arraycopy(s, i * sw + j0, pad, py * W + px0 + j0, j1 - j0);
        }
      } else {        // blob is (sw, sh): blob row j = source column j
        for (int j = 0; j < sw; j++) {
          int px = px0 + j;
          if (px < 0 || px >= W) continue;
          for (int i = 0; i < sh; i++) {
            int py = py0 + i;
            if (py >= 0 && py < H) pad[py * W + px] = s[j * sh + i];
          }
        }
      }
    }

    // Horn slope, float32 math like the Python kernel (slope.py:58)
    float[] out = new float[h * w];
    for (int y = 0; y < h; y++) {
      int r0 = y * W, r1 = (y + 1) * W, r2 = (y + 2) * W, ro = y * w;
      for (int x = 0; x < w; x++) {
        float a = pad[r0 + x], b = pad[r0 + x + 1], c = pad[r0 + x + 2];
        float dd = pad[r1 + x],                     f = pad[r1 + x + 2];
        float g = pad[r2 + x], hh = pad[r2 + x + 1], i = pad[r2 + x + 2];
        float dzdx = ((c + 2f * f + i) - (a + 2f * dd + g)) / 8f;
        float dzdy = ((g + 2f * hh + i) - (a + 2f * b + c)) / 8f;
        float pslope = (float) Math.sqrt(dzdx * dzdx + dzdy * dzdy);
        out[ro + x] = (float) Math.atan(pslope) * 57.29578f;
      }
    }

    int e = Math.min(EDGE, w), er = Math.min(EDGE, h);
    return new byte[][] {
        encode(out, w, 0, h, 0, w, false, isz),
        encode(out, w, 0, h, 0, e, true, isz),        // __le (transposed)
        encode(out, w, 0, h, w - e, w, true, isz),    // __re (transposed)
        encode(out, w, 0, er, 0, w, false, isz),      // __te
        encode(out, w, h - er, h, 0, w, false, isz),  // __be
    };
  }
}
