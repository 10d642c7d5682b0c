package graft.ml

/** API-shape mirror of the ONNX Runtime Java binding (`ai.onnxruntime`):
  * `OrtEnvironment.getEnvironment()` → `env.createSession(modelBytes)` →
  * `session.run(Map[inputName -> OnnxTensor])` → named output tensors.
  *
  * The container ships no onnxruntime jar, so this package reproduces the
  * CALL SURFACE with a pure-JVM executor: the "model" is a serialized
  * single dense layer ([features] → 1 logit per token) applied to a
  * [batch, seqLen, features] float tensor — real tensor math driven by
  * real model bytes, not a regex behind a model-shaped door. Swapping in
  * the real runtime is mechanical:
  *
  *   - `OrtEnvironment.getEnvironment()`    → same name, same singleton
  *   - `env.createSession(bytes)`           → same name (real adds opts)
  *   - `OnnxTensor.createTensor(env, arr)`  → same name
  *   - `session.run(inputs)`                → same name; real returns
  *     `OrtSession.Result` (AutoCloseable) — the shim's Result mirrors
  *     `get(name)`
  *
  * Nothing Spark-side changes: the provider plumbing (one session per
  * executor JVM, bounded batches) is what the integration spec pins.
  *
  * Instrumentation counters (`envCount`, session `runCount`/`maxBatch`)
  * exist for that spec — a real runtime would drop them. */
object OnnxLike {

  final class OrtEnvironment private[OnnxLike] () {
    /** Build a session from model bytes (the real API's
      * `createSession(byte[], SessionOptions)`). */
    def createSession(modelBytes: Array[Byte]): OrtSession = new OrtSession(modelBytes)
  }

  object OrtEnvironment {
    @volatile private var created = 0
    private lazy val env: OrtEnvironment = synchronized { created += 1; new OrtEnvironment }
    /** Process-wide singleton, like the real binding. */
    def getEnvironment(): OrtEnvironment = env
    /** Environments ever constructed in this JVM (spec hook). */
    def envCount: Int = created
  }

  /** Dense float tensor, row-major [batch, seqLen, features]. */
  final class OnnxTensor private (
      val data: Array[Float], val shape: Array[Long]) {
    require(shape.product == data.length, "shape/data mismatch")
  }

  object OnnxTensor {
    def createTensor(env: OrtEnvironment, arr: Array[Array[Array[Float]]]): OnnxTensor = {
      val b = arr.length
      val l = if (b == 0) 0 else arr(0).length
      val f = if (l == 0) 0 else arr(0)(0).length
      val flat = new Array[Float](b * l * f)
      var i = 0
      for (bi <- 0 until b; li <- 0 until l; fi <- 0 until f) {
        flat(i) = arr(bi)(li)(fi); i += 1
      }
      new OnnxTensor(flat, Array(b.toLong, l.toLong, f.toLong))
    }
  }

  /** One session per loaded model. Thread-safe like the real OrtSession
    * (run() may be called concurrently from a executor's task threads). */
  final class OrtSession private[OnnxLike] (modelBytes: Array[Byte]) {
    // "Parse the graph": MAGIC + feature count + dense weights + bias.
    private val (weights, bias) = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(modelBytes))
      val magic = new Array[Byte](4); in.readFully(magic)
      require(new String(magic, "US-ASCII") == "GNNX", "bad model magic")
      val f = in.readInt()
      ((0 until f).map(_ => in.readFloat()).toArray, in.readFloat())
    }

    @volatile private var runs = 0
    @volatile private var maxB = 0
    /** Inference calls made through this session (spec hook). */
    def runCount: Int = runs
    /** Largest batch dimension ever seen (spec hook — bounded batches). */
    def maxBatch: Int = maxB

    final class Result private[OrtSession] (outputs: Map[String, Array[Array[Array[Float]]]]) {
      def get(name: String): Array[Array[Array[Float]]] = outputs(name)
    }

    /** logits[b][l][0] = w · features[b][l] + bias — a real (tiny) forward
      * pass over the whole batch tensor. */
    def run(inputs: java.util.Map[String, OnnxTensor]): Result = {
      val t = inputs.get("features")
      require(t != null, "missing input tensor 'features'")
      val Array(b, l, f) = t.shape.map(_.toInt)
      require(f == weights.length, s"feature width $f != model width ${weights.length}")
      synchronized { runs += 1; maxB = math.max(maxB, b) }
      val out = Array.ofDim[Float](b, l, 1)
      var i = 0
      for (bi <- 0 until b; li <- 0 until l) {
        var z = bias
        var fi = 0
        while (fi < f) { z += weights(fi) * t.data(i); i += 1; fi += 1 }
        out(bi)(li)(0) = z
      }
      new Result(Map("logits" -> out))
    }
  }

  /** Serialize a single dense layer as model bytes. */
  def denseModelBytes(weights: Array[Float], bias: Float): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GNNX")
    out.writeInt(weights.length)
    weights.foreach(out.writeFloat)
    out.writeFloat(bias)
    out.flush()
    bos.toByteArray
  }
}
