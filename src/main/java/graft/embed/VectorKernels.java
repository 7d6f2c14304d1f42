package graft.embed;

/**
 * SIMD kernels for the pure-JVM transformer forward pass
 * ({@link TransformerSession}), built on {@code jdk.incubator.vector}
 * — the public JDK Vector API (incubating since JDK 16). The module
 * must be added explicitly ({@code --add-modules jdk.incubator.vector},
 * wired into build.sbt's javacOptions/javaOptions); when it is absent
 * at runtime the class falls back to the identical scalar loops, so a
 * stock JVM still computes the same numbers, just slower.
 *
 * <p>NUMERICS CONTRACT: only element-parallel operations are
 * vectorized (saxpy: {@code out[i] += x * row[i]}), never reductions —
 * each output element keeps exactly one IEEE multiply and one add per
 * call, in the same order as the scalar loop, and no FMA contraction
 * is used. Results are therefore BIT-IDENTICAL to the scalar path:
 * golden embedding vectors and oracle hashes cannot drift by enabling
 * or disabling SIMD.
 *
 * <p>This is the JVM answer to the reference's GPU batch inference
 * (utilities_core.py:162-180): the matmul inner loop was the measured
 * bottleneck of the h128 checkpoint probe (BASELINE.md round 9,
 * 1.4k tok/s), and an 8-lane AVX-512 double saxpy recovers most of the
 * single-thread gap while the {@code NativeRuntimeProvider} seam stays
 * open for a real ONNX runtime.
 */
public final class VectorKernels {
    private VectorKernels() {}

    private static final boolean SIMD = detect();

    private static boolean detect() {
        try {
            return Simd.laneCount() > 1;
        } catch (Throwable t) { // module absent: NoClassDefFoundError
            return false;
        }
    }

    /** Whether the Vector API module is present and multi-lane. */
    public static boolean simdEnabled() { return SIMD; }

    /** Preferred double lane count (1 when running scalar). */
    public static int lanes() { return SIMD ? Simd.laneCount() : 1; }

    /** {@code out[i] += x * row[i]} for all i — the row-major affine
     *  (y = x·W + b) inner loop. */
    public static void saxpy(double x, double[] row, double[] out) {
        if (SIMD) { Simd.saxpy(x, row, out); return; }
        for (int i = 0; i < out.length; i++) out[i] += x * row[i];
    }

    /** {@code out[off+i] += x * v[off+i]} for i in [0,n) — the
     *  attention context accumulation (per-head slice). */
    public static void saxpyRange(double x, double[] v, double[] out,
            int off, int n) {
        if (SIMD) { Simd.saxpyRange(x, v, out, off, n); return; }
        for (int i = 0; i < n; i++) out[off + i] += x * v[off + i];
    }

    /** Four-row blocked saxpy over FLOAT rows:
     *  {@code out[i] += x0*(double)r0[i]; ...} in row order per
     *  element — bit-identical to the widening scalar loop (float→
     *  double conversion is exact), but rows stream at 4 bytes per
     *  element instead of 8, which matters once the weight matrices
     *  fall out of L2 (h ≳ 512). */
    public static void saxpy4f(double x0, float[] r0, double x1, float[] r1,
            double x2, float[] r2, double x3, float[] r3, double[] out) {
        if (SIMD) { Simd.saxpy4f(x0, r0, x1, r1, x2, r2, x3, r3, out); return; }
        for (int i = 0; i < out.length; i++) {
            double o = out[i];
            o += x0 * r0[i];
            o += x1 * r1[i];
            o += x2 * r2[i];
            o += x3 * r3[i];
            out[i] = o;
        }
    }

    /** Single-row float saxpy: {@code out[i] += x * (double) row[i]}. */
    public static void saxpyf(double x, float[] row, double[] out) {
        if (SIMD) { Simd.saxpyf(x, row, out); return; }
        for (int i = 0; i < out.length; i++) out[i] += x * row[i];
    }

    /** Four-row blocked saxpy:
     *  {@code out[i] += x0*r0[i]; out[i] += x1*r1[i]; ...} with the
     *  adds applied IN ROW ORDER per element — bit-identical to four
     *  successive {@link #saxpy} calls, but the out vector is loaded
     *  and stored once per block instead of once per row. C2
     *  auto-vectorizes the single-row loop already (the lanes are
     *  free); this register blocking is the transform it does NOT do,
     *  and it roughly doubles arithmetic intensity on the matmul. */
    public static void saxpy4(double x0, double[] r0, double x1, double[] r1,
            double x2, double[] r2, double x3, double[] r3, double[] out) {
        if (SIMD) { Simd.saxpy4(x0, r0, x1, r1, x2, r2, x3, r3, out); return; }
        for (int i = 0; i < out.length; i++) {
            double o = out[i];
            o += x0 * r0[i];
            o += x1 * r1[i];
            o += x2 * r2[i];
            o += x3 * r3[i];
            out[i] = o;
        }
    }

    /** Inner holder so {@code jdk.incubator.vector} classes are only
     *  touched inside {@link #detect}'s try — a JVM without the module
     *  throws at THIS class's init, which detect() catches. */
    private static final class Simd {
        private static final jdk.incubator.vector.VectorSpecies<Double> SP =
            jdk.incubator.vector.DoubleVector.SPECIES_PREFERRED;
        /** Float species with the SAME lane count as SP, so one float
         *  load converts (vcvtps2pd) into one full double vector. */
        private static final jdk.incubator.vector.VectorSpecies<Float> FSP =
            jdk.incubator.vector.VectorSpecies.of(float.class,
                jdk.incubator.vector.VectorShape.forBitSize(SP.length() * 32));

        static int laneCount() { return SP.length(); }

        private static jdk.incubator.vector.DoubleVector loadF2D(float[] r, int i) {
            return (jdk.incubator.vector.DoubleVector)
                jdk.incubator.vector.FloatVector.fromArray(FSP, r, i)
                    .convertShape(jdk.incubator.vector.VectorOperators.F2D, SP, 0);
        }

        static void saxpyf(double x, float[] row, double[] out) {
            final var vx = jdk.incubator.vector.DoubleVector.broadcast(SP, x);
            final int ub = SP.loopBound(out.length);
            int i = 0;
            for (; i < ub; i += SP.length()) {
                var o = jdk.incubator.vector.DoubleVector.fromArray(SP, out, i);
                o.add(loadF2D(row, i).mul(vx)).intoArray(out, i);
            }
            for (; i < out.length; i++) out[i] += x * row[i];
        }

        static void saxpy4f(double x0, float[] r0, double x1, float[] r1,
                double x2, float[] r2, double x3, float[] r3, double[] out) {
            final var v0 = jdk.incubator.vector.DoubleVector.broadcast(SP, x0);
            final var v1 = jdk.incubator.vector.DoubleVector.broadcast(SP, x1);
            final var v2 = jdk.incubator.vector.DoubleVector.broadcast(SP, x2);
            final var v3 = jdk.incubator.vector.DoubleVector.broadcast(SP, x3);
            final int ub = SP.loopBound(out.length);
            int i = 0;
            for (; i < ub; i += SP.length()) {
                var o = jdk.incubator.vector.DoubleVector.fromArray(SP, out, i);
                o = o.add(loadF2D(r0, i).mul(v0));
                o = o.add(loadF2D(r1, i).mul(v1));
                o = o.add(loadF2D(r2, i).mul(v2));
                o = o.add(loadF2D(r3, i).mul(v3));
                o.intoArray(out, i);
            }
            for (; i < out.length; i++) {
                double o = out[i];
                o += x0 * r0[i];
                o += x1 * r1[i];
                o += x2 * r2[i];
                o += x3 * r3[i];
                out[i] = o;
            }
        }

        static void saxpy(double x, double[] row, double[] out) {
            final var vx = jdk.incubator.vector.DoubleVector.broadcast(SP, x);
            final int ub = SP.loopBound(out.length);
            int i = 0;
            for (; i < ub; i += SP.length()) {
                var r = jdk.incubator.vector.DoubleVector.fromArray(SP, row, i);
                var o = jdk.incubator.vector.DoubleVector.fromArray(SP, out, i);
                // mul-then-add (no fma): same rounding as the scalar loop
                o.add(r.mul(vx)).intoArray(out, i);
            }
            for (; i < out.length; i++) out[i] += x * row[i];
        }

        static void saxpyRange(double x, double[] v, double[] out,
                int off, int n) {
            final var vx = jdk.incubator.vector.DoubleVector.broadcast(SP, x);
            final int ub = SP.loopBound(n);
            int i = 0;
            for (; i < ub; i += SP.length()) {
                var r = jdk.incubator.vector.DoubleVector.fromArray(SP, v, off + i);
                var o = jdk.incubator.vector.DoubleVector.fromArray(SP, out, off + i);
                o.add(r.mul(vx)).intoArray(out, off + i);
            }
            for (; i < n; i++) out[off + i] += x * v[off + i];
        }

        static void saxpy4(double x0, double[] r0, double x1, double[] r1,
                double x2, double[] r2, double x3, double[] r3, double[] out) {
            final var v0 = jdk.incubator.vector.DoubleVector.broadcast(SP, x0);
            final var v1 = jdk.incubator.vector.DoubleVector.broadcast(SP, x1);
            final var v2 = jdk.incubator.vector.DoubleVector.broadcast(SP, x2);
            final var v3 = jdk.incubator.vector.DoubleVector.broadcast(SP, x3);
            final int ub = SP.loopBound(out.length);
            int i = 0;
            for (; i < ub; i += SP.length()) {
                var o = jdk.incubator.vector.DoubleVector.fromArray(SP, out, i);
                // sequential row-order adds, mul-then-add (no fma): the
                // per-element rounding sequence matches four plain saxpys
                o = o.add(jdk.incubator.vector.DoubleVector.fromArray(SP, r0, i).mul(v0));
                o = o.add(jdk.incubator.vector.DoubleVector.fromArray(SP, r1, i).mul(v1));
                o = o.add(jdk.incubator.vector.DoubleVector.fromArray(SP, r2, i).mul(v2));
                o = o.add(jdk.incubator.vector.DoubleVector.fromArray(SP, r3, i).mul(v3));
                o.intoArray(out, i);
            }
            for (; i < out.length; i++) {
                double o = out[i];
                o += x0 * r0[i];
                o += x1 * r1[i];
                o += x2 * r2[i];
                o += x3 * r3[i];
                out[i] = o;
            }
        }
    }
}
