PREFIX ex: <http://ex/>
INSERT DATA { ex:c ex:name "Cid" }
